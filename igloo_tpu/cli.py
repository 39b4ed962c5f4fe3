"""igloo-tpu CLI.

≙ the reference `igloo` binary (/root/reference/crates/igloo/src/main.rs):
  --sql          execute one statement and print the result table
  --config       JSON config file (the reference accepts but ignores this
                 flag, main.rs:36-39; here it is honored)
  --distributed  execute over the device mesh (the reference falls back to
                 local, main.rs:97-100; here it actually distributes)
  --serve        start the Arrow Flight endpoint (≙ coordinator main.rs:67-77)
  --repl         interactive shell

With no table registrations, a 5-row in-memory `users` table is provided,
matching the reference CLI's demo table (main.rs:64-77).
"""

from __future__ import annotations

import argparse
import sys


def _demo_users_engine(engine):
    import pyarrow as pa
    engine.register_table("users", pa.table({
        "id": pa.array([1, 2, 3, 4, 5], type=pa.int32()),
        "name": ["Alice", "Bob", "Charlie", "Diana", "Eve"],
        "age": pa.array([25, 30, 35, 28, 32], type=pa.int32()),
    }))


def _print_table(table) -> None:
    """Arrow-style box printing (≙ arrow::util::pretty::print_batches)."""
    cols = table.column_names
    data = [[_fmt(v) for v in table.column(c).to_pylist()] for c in cols]
    widths = [max(len(c), *(len(v) for v in col), 1) if col else len(c)
              for c, col in zip(cols, data)]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    print(sep)
    print("|" + "|".join(f" {c:<{w}} " for c, w in zip(cols, widths)) + "|")
    print(sep)
    for i in range(table.num_rows):
        print("|" + "|".join(
            f" {data[j][i]:<{widths[j]}} " for j in range(len(cols))) + "|")
    print(sep)


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def build_engine(args):
    from .config import EngineConfig
    from .engine import QueryEngine

    config = EngineConfig.from_file(args.config) if args.config else EngineConfig()
    if args.distributed:
        config.distributed = True

    if config.distributed:
        from .parallel.engine import DistributedQueryEngine
        engine = DistributedQueryEngine(config=config,
                                        cache_dir=config.cache_dir)
    else:
        engine = QueryEngine(result_cache=config.result_cache,
                             cache_dir=config.cache_dir)

    registered = False
    for name, spec in (config.tables or {}).items():
        fmt = spec.get("format", "parquet")
        path = spec["path"]
        if fmt == "parquet":
            engine.register_parquet(name, path)
        elif fmt == "csv":
            engine.register_csv(name, path,
                                has_header=spec.get("has_header", True))
        elif fmt == "iceberg":
            engine.register_iceberg(name, path)
        else:
            raise SystemExit(f"unknown table format {fmt!r}")
        registered = True
    if not registered:
        _demo_users_engine(engine)
    return engine


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="igloo-tpu",
        description="TPU-native distributed SQL query engine")
    parser.add_argument("--sql", help="SQL statement to execute")
    parser.add_argument("--config", help="JSON config file path")
    parser.add_argument("--distributed", action="store_true",
                        help="execute over the full device mesh")
    parser.add_argument("--serve", action="store_true",
                        help="serve an Arrow Flight endpoint")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=50051)
    parser.add_argument("--repl", action="store_true", help="interactive shell")
    args = parser.parse_args(argv)

    engine = build_engine(args)

    if args.serve:
        from .api.flight import serve
        print(f"Igloo-TPU Flight endpoint listening on "
              f"grpc://{args.host}:{args.port} (ctrl-c to stop)")
        serve(engine, host=args.host, port=args.port)
        return 0

    if args.sql:
        out = engine.execute(args.sql)
        _print_table(out)
        m = engine.last_metrics
        if m:
            print(f"{m.total_rows} rows in {m.execution_time_ms:.1f} ms")
        return 0

    if args.repl or sys.stdin.isatty():
        return _repl(engine)

    sql = sys.stdin.read().strip()
    if sql:
        _print_table(engine.execute(sql))
    return 0


def _repl(engine) -> int:
    print("igloo-tpu interactive shell — end statements with ';', "
          "\\q to quit, \\d to list tables")
    buf: list[str] = []
    while True:
        try:
            line = input("... " if buf else "igloo> ")
        except (EOFError, KeyboardInterrupt):
            print()
            return 0
        if line.strip() in ("\\q", "exit", "quit"):
            return 0
        if line.strip() == "\\d":
            for t in engine.table_names():
                print(f"  {t}")
            continue
        buf.append(line)
        if line.rstrip().endswith(";"):
            sql = "\n".join(buf)
            buf = []
            try:
                _print_table(engine.execute(sql))
            except Exception as e:  # noqa: BLE001 — REPL survives bad queries
                print(f"error: {e}")


if __name__ == "__main__":
    raise SystemExit(main())
