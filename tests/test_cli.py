"""CLI smoke tests (≙ reference igloo binary surface, crates/igloo/src/main.rs)."""

import subprocess
import sys
import json


def run_cli(*args, stdin=None):
    return subprocess.run(
        [sys.executable, "-m", "igloo_tpu.cli", *args],
        capture_output=True, text=True, timeout=240, input=stdin,
        cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"})


def test_cli_sql_demo_users():
    # the reference demo: in-memory users table (main.rs:64-77)
    out = run_cli("--sql", "SELECT name, age FROM users WHERE age > 30 ORDER BY age")
    assert out.returncode == 0, out.stderr
    assert "Eve" in out.stdout and "Charlie" in out.stdout
    assert "2 rows" in out.stdout


def test_cli_config_file(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({"x": [1, 2, 3]}), tmp_path / "t.parquet")
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({
        "tables": {"t": {"path": str(tmp_path / "t.parquet"),
                         "format": "parquet"}}}))
    out = run_cli("--config", str(cfg), "--sql", "SELECT sum(x) AS s FROM t")
    assert out.returncode == 0, out.stderr
    assert "6" in out.stdout


def test_cli_stdin():
    out = run_cli(stdin="SELECT 1 AS one")
    assert out.returncode == 0, out.stderr
    assert "one" in out.stdout
