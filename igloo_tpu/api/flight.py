"""Arrow Flight SQL endpoint.

≙ the reference's IglooFlightSqlService
(/root/reference/crates/api/src/lib.rs:40-185):

- get_flight_info: executes the SQL in FlightDescriptor.cmd and returns
  the result schema + a ticket carrying the raw SQL bytes (lib.rs:81-99);
- do_get: executes the SQL in the Ticket and streams the Arrow result
  (lib.rs:108-149);
- list_flights enumerates registered tables and get_schema returns a
  table's schema — completing surface the reference leaves
  `unimplemented!` (lib.rs:67-184);
- do_put/do_exchange stay unimplemented, like the reference.

Server runs in the coordinator process (JAX process 0); results are
device tables IPC-encoded on host at the edge only.
"""

from __future__ import annotations

import threading

import pyarrow as pa
import pyarrow.flight as fl


class IglooFlightServer(fl.FlightServerBase):
    def __init__(self, engine, host: str = "127.0.0.1", port: int = 50051,
                 **kwargs):
        self.engine = engine
        self._location = f"grpc://{host}:{port}"
        super().__init__(self._location, **kwargs)

    # ---- metadata ----

    def list_flights(self, context, criteria):
        for name in self.engine.table_names():
            schema = pa.schema([
                pa.field(f.name, f.dtype.to_arrow(), f.nullable)
                for f in self.engine.catalog.table_schema(name)])
            desc = fl.FlightDescriptor.for_path(name.encode())
            yield fl.FlightInfo(schema, desc, [], -1, -1)

    def get_schema(self, context, descriptor):
        if descriptor.path:
            name = descriptor.path[0].decode()
            schema = pa.schema([
                pa.field(f.name, f.dtype.to_arrow(), f.nullable)
                for f in self.engine.catalog.table_schema(name)])
            return fl.SchemaResult(schema)
        sql = descriptor.command.decode()
        return fl.SchemaResult(self.engine.execute(sql).schema)

    def get_flight_info(self, context, descriptor):
        """Execute the SQL and return schema + a ticket (the SQL bytes),
        exactly the reference's shape (lib.rs:81-99)."""
        sql = descriptor.command.decode()
        result = self.engine.execute(sql)
        endpoint = fl.FlightEndpoint(fl.Ticket(sql.encode()),
                                     [self._location])
        return fl.FlightInfo(result.schema, descriptor, [endpoint],
                             result.num_rows, result.nbytes)

    # ---- data ----

    def do_get(self, context, ticket):
        sql = ticket.ticket.decode()
        table = self.engine.execute(sql)
        return fl.RecordBatchStream(table)

    # ---- actions (control-plane convenience) ----

    def do_action(self, context, action):
        if action.type == "show_tables":
            for name in self.engine.table_names():
                yield fl.Result(name.encode())
        elif action.type == "explain":
            yield fl.Result(self.engine.explain(action.body.to_pybytes()
                                                .decode()).encode())
        elif action.type == "metrics":
            import json
            m = self.engine.last_metrics
            yield fl.Result(json.dumps(m.to_dict() if m else {}).encode())
        else:
            raise NotImplementedError(f"action {action.type!r}")

    def list_actions(self, context):
        return [("show_tables", "list registered tables"),
                ("explain", "explain a SQL statement"),
                ("metrics", "last query metrics")]


class IglooFlightClient:
    """Thin client (the reference's client crate is a stub,
    /root/reference/crates/client/src/main.rs:1-4 — this completes it)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 50051):
        self._client = fl.connect(f"grpc://{host}:{port}")

    def execute(self, sql: str) -> pa.Table:
        info = self._client.get_flight_info(
            fl.FlightDescriptor.for_command(sql.encode()))
        reader = self._client.do_get(info.endpoints[0].ticket)
        return reader.read_all()

    def tables(self) -> list[str]:
        return [r.body.to_pybytes().decode()
                for r in self._client.do_action(("show_tables", b""))]

    def explain(self, sql: str) -> str:
        out = list(self._client.do_action(("explain", sql.encode())))
        return out[0].body.to_pybytes().decode()

    def close(self):
        self._client.close()


def serve(engine, host: str = "127.0.0.1", port: int = 50051) -> None:
    """Blocking serve with graceful shutdown on ctrl-c
    (≙ coordinator main.rs:67-77)."""
    server = IglooFlightServer(engine, host, port)
    try:
        server.serve()
    except KeyboardInterrupt:
        server.shutdown()


def serve_background(engine, host: str = "127.0.0.1", port: int = 0):
    """Start in a thread; returns (server, actual_port)."""
    server = IglooFlightServer(engine, host, port)
    t = threading.Thread(target=server.serve, daemon=True)
    t.start()
    return server, server.port
