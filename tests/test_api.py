"""API edge tests: Arrow Flight SQL + gRPC cluster control plane.

≙ reference surface: IglooFlightSqlService (api/src/lib.rs) and
CoordinatorService register/heartbeat (coordinator/src/service.rs).
"""

import time

import pyarrow as pa
import pytest


@pytest.fixture()
def flight_pair(engine):
    from igloo_tpu.api.flight import IglooFlightClient, serve_background
    engine.register_table("t", pa.table({
        "x": [1, 2, 3, 4], "s": ["a", "b", "a", "c"]}))
    server, port = serve_background(engine, port=0)
    client = IglooFlightClient(port=port)
    yield engine, client
    client.close()
    server.shutdown()


def test_flight_execute(flight_pair):
    _, client = flight_pair
    out = client.execute("SELECT s, sum(x) AS sx FROM t GROUP BY s ORDER BY s")
    assert out.column("s").to_pylist() == ["a", "b", "c"]
    assert out.column("sx").to_pylist() == [4, 2, 4]


def test_flight_metadata(flight_pair):
    _, client = flight_pair
    assert client.tables() == ["t"]
    assert "Scan" in client.explain("SELECT x FROM t")


def test_cluster_register_heartbeat():
    from igloo_tpu.api import cluster_pb2 as pb
    from igloo_tpu.parallel.cluster import (CoordinatorClient,
                                            CoordinatorServer, WorkerAgent)

    coord = CoordinatorServer().start()
    try:
        agent = WorkerAgent(f"127.0.0.1:{coord.port}",
                            address="127.0.0.1:50052",
                            num_devices=4, device_kind="TPU v5e").start()
        try:
            assert agent.process_index == 0
            client = CoordinatorClient(f"127.0.0.1:{coord.port}")
            info = client.get_cluster_info(pb.Empty())
            assert len(info.workers) == 1
            assert info.workers[0].num_devices == 4
            # heartbeat refreshes liveness
            assert coord.state.heartbeat(agent.worker_id)
            # unknown workers get ok=false (reference service.rs:37-50)
            ack = client.send_heartbeat(pb.Heartbeat(worker_id="ghost"))
            assert not ack.ok
            assert len(coord.state.live_workers()) == 1
            client.close()
        finally:
            agent.stop()
    finally:
        coord.stop()


def test_cluster_query_dispatch(engine):
    from igloo_tpu.parallel.cluster import CoordinatorClient, CoordinatorServer

    engine.register_table("nums", pa.table({"n": [1, 2, 3]}))
    coord = CoordinatorServer(engine=engine).start()
    try:
        client = CoordinatorClient(f"127.0.0.1:{coord.port}")
        out = client.execute("SELECT sum(n) AS s FROM nums")
        assert out.column("s").to_pylist() == [6]
        with pytest.raises(RuntimeError, match="not found"):
            client.execute("SELECT * FROM missing_table")
        client.close()
    finally:
        coord.stop()


def test_worker_task_service(engine):
    from igloo_tpu.parallel.cluster import WorkerTaskClient, WorkerTaskService

    engine.register_table("w", pa.table({"x": [1, 2, 3, 4]}))
    svc = WorkerTaskService(engine).start()
    try:
        client = WorkerTaskClient(f"127.0.0.1:{svc.port}")
        out = client.run("task-1", "SELECT sum(x) AS s FROM w WHERE x > 1")
        assert out.column("s").to_pylist() == [9]
        with pytest.raises(RuntimeError, match="not found"):
            client.run("task-2", "SELECT * FROM missing")
        client.close()
    finally:
        svc.stop()


def test_flight_concurrent_hammer(engine):
    """N client threads hammer do_get with mixed queries while CTAS/DROP
    cycles race the catalog epoch (VERDICT r4 #9). Stable-table queries
    must return exact results every time; the churn errors (if any) must
    be clean engine errors, never corrupted results or a wedged server."""
    import threading

    from igloo_tpu.api.flight import IglooFlightClient, serve_background

    engine.register_table("t", pa.table({
        "x": [1, 2, 3, 4], "s": ["a", "b", "a", "c"]}))
    ks = list(range(200)) * 5
    vs = list(range(1000))
    engine.register_table("big", pa.table({"k": ks, "v": vs}))
    server, port = serve_background(engine, port=0)
    try:
        exp_kv = sum(v for k, v in zip(ks, vs) if k < 100)
        queries = [
            ("SELECT sum(x) AS s FROM t", [10]),
            ("SELECT count(*) AS c FROM big", [1000]),
            ("SELECT sum(v) AS s FROM big WHERE k < 100", [exp_kv]),
            ("SELECT s, sum(x) AS sx FROM t GROUP BY s ORDER BY s",
             ["a", "b", "c"]),
        ]
        errors: list = []
        mismatches: list = []
        stop = threading.Event()

        def hammer(i):
            # one client per thread (Flight clients aren't documented
            # thread-safe); all share the one server/engine
            c = IglooFlightClient(port=port)
            try:
                for n in range(12):
                    sql, want = queries[(i + n) % len(queries)]
                    try:
                        got = c.execute(sql).column(0).to_pylist()
                    except Exception as e:  # noqa: BLE001
                        errors.append((sql, repr(e)))
                        continue
                    if got != want:
                        mismatches.append((sql, got, want))
            finally:
                c.close()

        def churn():
            while not stop.is_set():
                try:
                    engine.execute(
                        "CREATE TABLE tmp_c AS SELECT x FROM t")
                    engine.execute("DROP TABLE tmp_c")
                except Exception:  # noqa: BLE001
                    pass            # churn races itself; queries matter

        ct = threading.Thread(target=churn, daemon=True)
        ct.start()
        threads = [threading.Thread(target=hammer, args=(i,))
                   for i in range(6)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=180)
        stop.set()
        ct.join(timeout=10)
        assert not any(th.is_alive() for th in threads), "hammer wedged"
        assert not mismatches, mismatches[:3]
        # stable tables must never error
        assert not errors, errors[:3]
    finally:
        server.shutdown()
