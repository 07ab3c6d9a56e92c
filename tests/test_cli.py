"""CLI entry points (python -m rayval)."""

import json

import pyarrow as pa
import pyarrow.parquet as pq


def test_cli_check_xsd(tmp_path, ray_session, capsys):
    from rayval.__main__ import main

    xsd = tmp_path / "s.xsd"
    xsd.write_text(
        """<schema><element name="t"><complexType><all>
             <element name="v">
               <simpleType><restriction base="integer">
                 <minInclusive value="0"/></restriction></simpleType>
             </element>
           </all></complexType></element></schema>"""
    )
    table = tmp_path / "t.parquet"
    pq.write_table(pa.table({"k": ["a", "b", "c"], "v": [1, -2, 3]}), table)
    rc = main(["check", "--schema", str(xsd), "--table", str(table), "--key", "k"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "b,v.range" in out

    rc2 = main(["check", "--schema", str(xsd), "--table", str(table), "--key", "k"])
    assert rc2 == 1  # deterministic on rerun


def test_cli_check_json_dsl(tmp_path, ray_session, capsys):
    from rayval.__main__ import main

    spec = {"name": "t", "key": "k", "fields": {"v": {"min": 0}}}
    js = tmp_path / "s.json"
    js.write_text(json.dumps(spec))
    table = tmp_path / "t.parquet"
    pq.write_table(pa.table({"k": ["a"], "v": [5]}), table)
    rc = main(["check", "--schema", str(js), "--table", str(table), "--key", "k"])
    assert rc == 0


def test_cli_validate(tmp_path, ray_session, capsys):
    from rayval.__main__ import main
    from rayval.sources.images import generate_images

    data = generate_images(str(tmp_path / "imgs"), n=60, fragments=2, seed=3)
    rc = main([
        "validate", "--images", data + "/images", "--out", str(tmp_path / "out"),
        "--captions", data + "/captions.parquet", "--group-size", "2",
        "--decode-concurrency", "2",
    ])
    report = json.loads(capsys.readouterr().out)
    assert rc == 1  # planted violations -> global verdict false
    assert report["rows_scanned"] == 60


def test_cli_check_missing_required_column(tmp_path, ray_session, capsys):
    """A table MISSING a declared column must fail check (masks() skips
    absent columns, so only the structural pass can catch this)."""
    from rayval.__main__ import main

    spec = {"name": "t", "key": "k", "fields": {"v": {"min": 0, "required": True}}}
    js = tmp_path / "s.json"
    js.write_text(json.dumps(spec))
    table = tmp_path / "t.parquet"
    pq.write_table(pa.table({"k": ["a"], "other": [1]}), table)  # no 'v' at all
    rc = main(["check", "--schema", str(js), "--table", str(table), "--key", "k"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "v.missing" in out


def test_cli_check_annotated_out_roundtrip(tmp_path, ray_session, capsys):
    """--annotated-out writes the with-status form for an arbitrary profile:
    struct<value,status> per checked column + row_valid, consistent with the
    CSV violation listing from the same run."""
    from rayval.__main__ import main

    spec = {"name": "t", "key": "k",
            "fields": {"v": {"min": 0}, "s": {"pattern": "a+"}}}
    js = tmp_path / "s.json"
    js.write_text(json.dumps(spec))
    table = tmp_path / "t.parquet"
    pq.write_table(
        pa.table({"k": ["a", "b", "c"], "v": [1, -2, 3], "s": ["aa", "ab", "a"]}), table
    )
    out_dir = tmp_path / "annotated"
    rc = main(["check", "--schema", str(js), "--table", str(table),
               "--key", "k", "--annotated-out", str(out_dir)])
    assert rc == 1
    t = pq.read_table(str(out_dir)).to_pandas().set_index("k").sort_index()
    assert set(t.columns) >= {"v", "s", "row_valid"}
    # struct columns round-trip as dicts: value preserved, status per row
    assert t.loc["a", "v"] == {"value": 1, "status": True}
    assert t.loc["b", "v"] == {"value": -2, "status": False}
    assert t.loc["b", "s"] == {"value": "ab", "status": False}
    assert t.loc["c", "s"] == {"value": "a", "status": True}
    assert list(t["row_valid"]) == [True, False, True]
    # consistent with the listing printed by the same run
    out = capsys.readouterr().out
    assert "b,v.range" in out and "b,s.pattern" in out


def test_cli_validate_distributed_violations(tmp_path, ray_session, capsys):
    """--distributed-violations wires through to RunConfig: per-task listing
    parts on disk, same report shape."""
    import glob

    from rayval.__main__ import main
    from rayval.sources.images import generate_images

    data = generate_images(str(tmp_path / "imgs"), n=60, fragments=2, seed=3)
    out = str(tmp_path / "out_dist")
    rc = main([
        "validate", "--images", data + "/images", "--out", out,
        "--captions", data + "/captions.parquet", "--group-size", "2",
        "--decode-concurrency", "2", "--distributed-violations",
    ])
    report = json.loads(capsys.readouterr().out)
    assert rc == 1 and report["rows_scanned"] == 60
    parts = glob.glob(out + "/violations/group-*/*.parquet")
    assert parts and all(p.split("/")[-1].startswith("viol-") for p in parts)


def test_cli_check_table_rules(tmp_path, ray_session, capsys):
    """The check subcommand honors the profile's DECLARED table rules
    (unique / functional / row_count) alongside the per-column masks; rules
    needing external inputs are refused loudly, not silently skipped."""
    from rayval.__main__ import main

    # every column declared as a field so the structural set-equality check
    # stays quiet and the output isolates rule violations
    spec = {
        "name": "t", "key": "k",
        "fields": {"v": {"min": 0}, "u": {}, "a": {}, "b": {}},
        "rules": [
            {"kind": "unique", "column": "u"},
            {"kind": "functional", "column": "a", "determines": "b"},
            {"kind": "row_count", "column": "table", "min_rows": 100},
        ],
    }
    schema = tmp_path / "s.json"
    schema.write_text(json.dumps(spec))
    table = tmp_path / "t.parquet"
    pq.write_table(
        pa.table(
            {
                "k": pa.array([f"r{i}" for i in range(6)]),
                "v": pa.array([1.0, -2.0, 3.0, 4.0, 5.0, 6.0]),
                "u": pa.array([1, 1, 2, 3, 4, 5], type=pa.int64()),
                "a": pa.array([7, 7, 8, 8, 9, 9], type=pa.int64()),
                "b": pa.array([1, 2, 3, 3, 4, 4], type=pa.int64()),
            }
        ),
        table,
    )
    rc = main(["check", "--schema", str(schema), "--table", str(table), "--key", "k"])
    out = capsys.readouterr().out
    assert rc == 1
    for line in ("r1,v.range", "r0,u.unique", "r1,u.unique",
                 "r0,a.functional.b", "r1,a.functional.b", "0,table.row_count"):
        assert line in out, line
    assert "r2,a.functional.b" not in out  # a=8 group is consistent... (b=3,3)

    # referential/drift declared -> loud refusal (exit 2), nothing printed as clean
    spec["rules"] = [{"kind": "referential", "column": "u"}]
    schema.write_text(json.dumps(spec))
    rc2 = main(["check", "--schema", str(schema), "--table", str(table), "--key", "k"])
    err = capsys.readouterr().err
    assert rc2 == 2
    assert "referential" in err
