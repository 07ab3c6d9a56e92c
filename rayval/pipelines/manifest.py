"""Per-fragment-group lineage + metrics checkpoint (north_rule: "each
partition writes a lineage + metrics checkpoint (rows scanned, sketches
serialized, violations emitted) so a killed run resumes from the last
committed fragment without recomputation").

Layout under ``out_dir``:

    manifest.jsonl             append-only commit log, one line per group
    results/group-NNNNN/       narrow per-row results parquet (post-decode)
    violations/group-NNNNN/    violation rows for the group's fragments
    sketches/group-NNNNN.pkl   {partition_id: ColumnStats} partials
    blooms/group-NNNNN.bin     Bloom partial over the group's decodable ids

A group is committed IFF its manifest line exists; outputs are written to
temp paths and renamed before the line is appended (write-ahead ordering), so
a kill at any point leaves either a fully committed group or an uncommitted
one that resume simply redoes.  Resume = set-difference of fragment files
against committed fragments.
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def committed(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        return out

    def committed_fragments(self) -> set[str]:
        return {os.path.basename(f) for entry in self.committed() for f in entry["fragments"]}

    def next_group_id(self) -> int:
        c = self.committed()
        return 1 + max((e["group_id"] for e in c), default=-1)

    def group_paths(self, group_id: int) -> dict[str, str]:
        g = f"group-{group_id:05d}"
        return {
            "results": os.path.join(self.out_dir, "results", g),
            "violations": os.path.join(self.out_dir, "violations", g),
            "annotated": os.path.join(self.out_dir, "annotated", g),
            "sketches": os.path.join(self.out_dir, "sketches", f"{g}.pkl"),
            "bloom": os.path.join(self.out_dir, "blooms", f"{g}.bin"),
        }

    def commit(self, group_id: int, fragments: list[str], rows: int, violations: int,
               sketches_bytes: int = 0, partitions: int = 0, bloom_bytes: int = 0) -> None:
        entry = {
            "group_id": group_id,
            "fragments": [os.path.basename(f) for f in fragments],
            "rows_scanned": rows,
            "violations_emitted": violations,
            "sketches_serialized_bytes": sketches_bytes,
            "partitions": partitions,
            "bloom_bytes": bloom_bytes,
            "committed_at": time.time(),
        }
        with open(self.path, "a") as fh:
            fh.write(json.dumps(entry) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
