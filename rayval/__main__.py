"""Command-line entry points.

    python -m rayval validate --images DIR --out DIR [--captions FILE]
        Run the flagship checkpointed validation pipeline (resumable: rerun
        with the same --out to skip committed fragment groups).

    python -m rayval check --schema FILE(.xsd|.json) --table FILE.parquet
        [--element NAME] [--key COL] [--annotated-out DIR]
        Compile a schema (XSD subset or JSON DSL) and validate one parquet
        table; prints the violation listing as CSV and exits non-zero if any.
        --annotated-out additionally writes the reference's in-band output
        shape (struct<value,status> per checked column + row_valid).

Owns its Ray session (guarded init; the driver/test harness never imports
this module).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_validate(args) -> int:
    ray = _ray_session(args.num_cpus)
    from rayval.pipelines.validate_images import RunConfig, load_profile, run

    cfg = RunConfig(
        group_size=args.group_size,
        decode_concurrency=args.decode_concurrency,
        annotated_output=args.annotated,
        distributed_violations=args.distributed_violations,
        phash_near_radius=args.phash_near_radius,
    )
    ref = load_profile(args.reference) if args.reference else None
    report = run(args.images, args.out, captions_path=args.captions,
                 reference_profile=ref, cfg=cfg)
    json.dump(report, sys.stdout, indent=2)
    print()
    ray.shutdown()
    return 0 if report["global_verdict"] else 1


def cmd_check(args) -> int:
    ray = _ray_session(args.num_cpus)
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd

    from rayval.constraints.profile import PARTITION_COL
    from rayval.stages.validate import MetaValidate, explode_violations
    from rayval.util import collect_tables

    if args.schema.endswith(".xsd") or args.schema.endswith(".xml"):
        from rayval.constraints.xsd import profile_from_xsd

        profile = profile_from_xsd(
            open(args.schema).read(), element=args.element, infer_scalars=False
        )
    else:
        from rayval.constraints.dsl import profile_from_json

        profile = profile_from_json(open(args.schema).read())
    key = args.key or profile.key
    validator = profile.compile()
    ds = rd.read_parquet(args.table)

    def prep(batch: pa.Table) -> pa.Table:
        if key and key in batch.column_names and key != "__row__":
            k = pc.cast(batch[key], pa.string())
        else:
            k = pa.nulls(batch.num_rows, pa.string())
        batch = batch.append_column("__key", k)
        import numpy as np

        return batch.append_column(PARTITION_COL, pa.array(np.zeros(batch.num_rows, dtype=np.int64)))

    masked = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        MetaValidate(validator), batch_format="pyarrow", zero_copy_batch=True
    )
    if args.annotated_out:
        # the reference's primary output shape (to-hiccup-meta / with-status,
        # parser.clj:345-371, 384-400) for ANY profile: every validated
        # column becomes struct<value, status> plus row_valid, derived from
        # the same mask pass that feeds the violation listing (materialize
        # once; no second validate)
        from rayval.stages.validate import annotate_from_masks

        masked = masked.materialize()
        masked.map_batches(
            lambda b: annotate_from_masks(b, drop_masks=True).drop_columns(
                ["__key", PARTITION_COL]
            ),
            batch_format="pyarrow",
        ).write_parquet(args.annotated_out)
    out = masked.map_batches(lambda b: explode_violations(b, key="__key"), batch_format="pyarrow")
    t = collect_tables(
        out,
        pa.schema(
            [(PARTITION_COL, pa.int64()), ("__key", pa.string()), ("constraint_id", pa.string())]
        ),
    )
    # structural/schema checks: masks() silently skips checks whose column is
    # absent, so a table MISSING a declared (even required) column would
    # otherwise validate clean here — evaluate the schema-level constraint
    # ids once against the table's schema (same path the flagship uses)
    structural = validator.schema_violations(
        pa.schema(
            [f for f in ds.schema().base_schema
             # the --key column is a reporting handle, not part of the
             # validated document — exempt it from the sequence/all set checks
             if f.name not in ("__key", PARTITION_COL, key)]
        )
    )
    if structural:
        rows = pa.table(
            {PARTITION_COL: pa.array([0] * len(structural), pa.int64()),
             "__key": pa.nulls(len(structural), pa.string()),
             "constraint_id": pa.array(structural, pa.string())}
        )
        t = pa.concat_tables([t, rows])
    # declared TABLE RULES (unique / unique_together / functional / null_rate
    # / row_count / neardup) run through the dispatcher so the CLI honors the
    # WHOLE declarative contract, not just the per-column half; rules needing
    # external inputs (referential sources, a drift reference profile) are
    # refused loudly rather than silently skipped
    local_rules = [r for r in profile.table_rules
                   if r.kind not in ("referential", "drift")]
    external = [r.kind for r in profile.table_rules
                if r.kind in ("referential", "drift")]
    if external:
        print(
            f"ERROR: schema declares {sorted(set(external))} table rules, which "
            "need external inputs the check subcommand does not take — run them "
            "via rayval.stages.rules.run_table_rules",
            file=sys.stderr,
        )
        ray.shutdown()
        return 2
    if local_rules:
        from rayval.constraints.profile import Profile as _P
        from rayval.stages.rules import run_table_rules

        rules_prof = _P(profile.name, [], table_rules=local_rules, key="__key")
        keyed = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        rt = run_table_rules(keyed, rules_prof, key="__key")
        if rt.num_rows:
            t = pa.concat_tables([t, rt.cast(t.schema)])
    print(f"{key or 'row'},constraint_id")
    for k, cid in zip(t["__key"].to_pylist(), t["constraint_id"].to_pylist()):
        print(f"{k},{cid}")
    print(f"# {t.num_rows} violations", file=sys.stderr)
    ray.shutdown()
    return 0 if t.num_rows == 0 else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="rayval")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="run the flagship image validation pipeline")
    v.add_argument("--images", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--captions", default=None)
    v.add_argument("--group-size", type=int, default=4)
    v.add_argument(
        "--decode-concurrency", type=int, default=None,
        help="actor-pool size for decode; omit for fused task decode "
             "(read->decode in one task, bytes never enter the object store)",
    )
    v.add_argument("--annotated", action="store_true")
    v.add_argument("--distributed-violations", action="store_true",
                   help="write the violation listing as per-task parquet parts and merge "
                        "it as a streaming Dataset (for wholesale-violating inputs; the "
                        "driver then only ever holds counts)")
    v.add_argument("--phash-near-radius", type=int, default=0,
                   help="also flag images whose pHash is within this many bits of "
                        "another's as 'phash.neardup' (0 = off; exact duplicates are "
                        "always flagged as 'phash.unique')")
    v.add_argument("--reference", default=None,
                   help="global_profile.bin from a previous run: enables drift checks")
    v.add_argument("--num-cpus", type=int, default=None)
    v.set_defaults(fn=cmd_validate)

    c = sub.add_parser("check", help="validate one parquet table against a schema")
    c.add_argument("--schema", required=True, help=".xsd/.xml (XSD subset) or .json (dict DSL)")
    c.add_argument("--table", required=True)
    c.add_argument("--element", default=None, help="XSD top-level element to use")
    c.add_argument("--key", default=None, help="column to report violation keys by")
    c.add_argument("--annotated-out", default=None,
                   help="also write the in-band annotated parquet (each checked column "
                        "as struct<value,status> + row_valid) to this directory")
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_check)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
