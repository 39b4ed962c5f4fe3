"""Cluster control plane: coordinator/worker membership over gRPC.

≙ the reference's CoordinatorService + worker lifecycle
(/root/reference/crates/coordinator/src/service.rs:22-51,
crates/worker/src/main.rs:14-52): RegisterWorker inserts into a
mutex-guarded cluster map, SendHeartbeat refreshes `last_seen` and
returns ok=false for unknown workers, workers heartbeat every 5 s.

On TPU the *data* plane is device collectives, so the control plane here
does exactly what the reference's does — membership, liveness, task
submission bookkeeping, query dispatch — plus:

- liveness view with a dead-worker cutoff (the reference tracks
  `last_seen` but never evicts — SURVEY §5),
- `bootstrap_jax_distributed()`: maps this surface onto
  `jax.distributed.initialize` for real multi-host slices
  (≙ register_worker, SURVEY §3.5 TPU mapping).

Service stubs are hand-wired with grpc generic handlers over protoc-
generated messages (no grpc codegen plugin needed).
"""

from __future__ import annotations

import threading
import time
import uuid
from concurrent import futures
from dataclasses import dataclass, field

import grpc

from ..api import cluster_pb2 as pb

_SERVICE = "igloo_tpu.cluster.CoordinatorService"
_WORKER_SERVICE = "igloo_tpu.cluster.WorkerService"
HEARTBEAT_INTERVAL_S = 5.0      # reference: worker main.rs:31
DEFAULT_DEAD_AFTER_S = 15.0


@dataclass
class WorkerState:
    info: pb.WorkerInfo
    last_seen: float = field(default_factory=time.time)
    process_index: int = 0


class ClusterState:
    """≙ ClusterState = Arc<Mutex<HashMap<worker_id, WorkerState>>>."""

    def __init__(self):
        self._workers: dict[str, WorkerState] = {}
        self._lock = threading.Lock()
        self._next_index = 0

    def register(self, info: pb.WorkerInfo) -> int:
        with self._lock:
            existing = self._workers.get(info.worker_id)
            if existing is not None:
                existing.info = info
                existing.last_seen = time.time()
                return existing.process_index
            idx = self._next_index
            self._next_index += 1
            self._workers[info.worker_id] = WorkerState(info, process_index=idx)
            return idx

    def heartbeat(self, worker_id: str) -> bool:
        with self._lock:
            w = self._workers.get(worker_id)
            if w is None:
                return False
            w.last_seen = time.time()
            return True

    def workers(self) -> list[WorkerState]:
        with self._lock:
            return list(self._workers.values())

    def live_workers(self, dead_after_s: float = DEFAULT_DEAD_AFTER_S):
        cutoff = time.time() - dead_after_s
        return [w for w in self.workers() if w.last_seen >= cutoff]


class CoordinatorServer:
    """gRPC coordinator: membership + SQL dispatch (process-0 role)."""

    def __init__(self, engine=None, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        self.state = ClusterState()
        self._server = grpc.server(futures.ThreadPoolExecutor(max_workers=16))
        self._server.add_generic_rpc_handlers((self._handlers(),))
        self.port = self._server.add_insecure_port(f"{host}:{port}")
        self.host = host

    # ---- RPC implementations ----

    def RegisterWorker(self, request: pb.WorkerInfo, context) -> pb.RegistrationAck:
        idx = self.state.register(request)
        return pb.RegistrationAck(
            accepted=True,
            message=f"worker {request.worker_id} registered",
            process_index=idx)

    def SendHeartbeat(self, request: pb.Heartbeat, context) -> pb.HeartbeatAck:
        return pb.HeartbeatAck(ok=self.state.heartbeat(request.worker_id))

    def GetClusterInfo(self, request: pb.Empty, context) -> pb.ClusterInfo:
        ws = self.state.workers()
        return pb.ClusterInfo(
            workers=[w.info for w in ws],
            last_seen_unix=[w.last_seen for w in ws])

    def ExecuteQuery(self, request: pb.QueryRequest, context) -> pb.QueryResult:
        if self.engine is None:
            return pb.QueryResult(error="coordinator has no engine attached")
        try:
            t0 = time.perf_counter()
            table = self.engine.execute(request.sql)
            ms = (time.perf_counter() - t0) * 1e3
            import io

            import pyarrow as pa
            buf = io.BytesIO()
            with pa.ipc.new_stream(buf, table.schema) as w:
                w.write_table(table)
            return pb.QueryResult(arrow_ipc=buf.getvalue(),
                                  total_rows=table.num_rows,
                                  execution_time_ms=ms)
        except Exception as e:  # noqa: BLE001 — errors cross the wire
            return pb.QueryResult(error=f"{type(e).__name__}: {e}")

    def _handlers(self):
        rpcs = {
            "RegisterWorker": grpc.unary_unary_rpc_method_handler(
                lambda req, ctx: self.RegisterWorker(req, ctx),
                request_deserializer=pb.WorkerInfo.FromString,
                response_serializer=pb.RegistrationAck.SerializeToString),
            "SendHeartbeat": grpc.unary_unary_rpc_method_handler(
                lambda req, ctx: self.SendHeartbeat(req, ctx),
                request_deserializer=pb.Heartbeat.FromString,
                response_serializer=pb.HeartbeatAck.SerializeToString),
            "GetClusterInfo": grpc.unary_unary_rpc_method_handler(
                lambda req, ctx: self.GetClusterInfo(req, ctx),
                request_deserializer=pb.Empty.FromString,
                response_serializer=pb.ClusterInfo.SerializeToString),
            "ExecuteQuery": grpc.unary_unary_rpc_method_handler(
                lambda req, ctx: self.ExecuteQuery(req, ctx),
                request_deserializer=pb.QueryRequest.FromString,
                response_serializer=pb.QueryResult.SerializeToString),
        }
        return grpc.method_handlers_generic_handler(_SERVICE, rpcs)

    def start(self):
        self._server.start()
        return self

    def stop(self, grace: float = 1.0):
        self._server.stop(grace)


class CoordinatorClient:
    def __init__(self, address: str):
        self._channel = grpc.insecure_channel(address)

        def rpc(name, req_t, resp_t):
            return self._channel.unary_unary(
                f"/{_SERVICE}/{name}",
                request_serializer=req_t.SerializeToString,
                response_deserializer=resp_t.FromString)

        self.register_worker = rpc("RegisterWorker", pb.WorkerInfo,
                                   pb.RegistrationAck)
        self.send_heartbeat = rpc("SendHeartbeat", pb.Heartbeat,
                                  pb.HeartbeatAck)
        self.get_cluster_info = rpc("GetClusterInfo", pb.Empty, pb.ClusterInfo)
        self.execute_query = rpc("ExecuteQuery", pb.QueryRequest,
                                 pb.QueryResult)

    def execute(self, sql: str):
        import io

        import pyarrow as pa
        res = self.execute_query(pb.QueryRequest(sql=sql))
        if res.error:
            raise RuntimeError(res.error)
        return pa.ipc.open_stream(io.BytesIO(res.arrow_ipc)).read_all()

    def close(self):
        self._channel.close()


class WorkerTaskService:
    """Worker-side task execution service.

    ≙ MyWorkerService (/root/reference/crates/worker/src/service.rs) —
    which logs and returns "SUBMITTED" without executing, and serves
    empty bytes for GetTaskData. Here tasks actually run: the payload is
    SQL executed on the local engine; results cache as Arrow IPC for the
    pull-based GetTaskData fetch (the reference's intended shuffle API,
    coordinator.proto:60-68)."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        self._results: dict[str, bytes] = {}
        self._status: dict[str, pb.TaskStatus] = {}
        self._lock = threading.Lock()
        self._server = grpc.server(futures.ThreadPoolExecutor(max_workers=8))
        self._server.add_generic_rpc_handlers((self._handlers(),))
        self.port = self._server.add_insecure_port(f"{host}:{port}")

    def ExecuteTask(self, request: pb.TaskDefinition, context) -> pb.TaskStatus:
        sql = request.payload.decode()
        try:
            table = self.engine.execute(sql)
            import io

            import pyarrow as pa
            buf = io.BytesIO()
            with pa.ipc.new_stream(buf, table.schema) as w:
                w.write_table(table)
            with self._lock:
                self._results[request.task_id] = buf.getvalue()
            st = pb.TaskStatus(task_id=request.task_id, state="DONE")
        except Exception as e:  # noqa: BLE001 — errors cross the wire
            st = pb.TaskStatus(task_id=request.task_id, state="FAILED",
                               error=f"{type(e).__name__}: {e}")
        with self._lock:
            self._status[request.task_id] = st
        return st

    def GetTaskData(self, request: pb.TaskDataRequest, context) -> pb.TaskDataChunk:
        with self._lock:
            data = self._results.get(request.task_id, b"")
        return pb.TaskDataChunk(arrow_ipc=data)

    def _handlers(self):
        rpcs = {
            "ExecuteTask": grpc.unary_unary_rpc_method_handler(
                lambda req, ctx: self.ExecuteTask(req, ctx),
                request_deserializer=pb.TaskDefinition.FromString,
                response_serializer=pb.TaskStatus.SerializeToString),
            "GetTaskData": grpc.unary_unary_rpc_method_handler(
                lambda req, ctx: self.GetTaskData(req, ctx),
                request_deserializer=pb.TaskDataRequest.FromString,
                response_serializer=pb.TaskDataChunk.SerializeToString),
        }
        return grpc.method_handlers_generic_handler(_WORKER_SERVICE, rpcs)

    def start(self):
        self._server.start()
        return self

    def stop(self, grace: float = 1.0):
        self._server.stop(grace)


class WorkerTaskClient:
    def __init__(self, address: str):
        self._channel = grpc.insecure_channel(address)
        self.execute_task = self._channel.unary_unary(
            f"/{_WORKER_SERVICE}/ExecuteTask",
            request_serializer=pb.TaskDefinition.SerializeToString,
            response_deserializer=pb.TaskStatus.FromString)
        self.get_task_data = self._channel.unary_unary(
            f"/{_WORKER_SERVICE}/GetTaskData",
            request_serializer=pb.TaskDataRequest.SerializeToString,
            response_deserializer=pb.TaskDataChunk.FromString)

    def run(self, task_id: str, sql: str):
        import io

        import pyarrow as pa
        st = self.execute_task(pb.TaskDefinition(task_id=task_id,
                                                 payload=sql.encode()))
        if st.state == "FAILED":
            raise RuntimeError(st.error)
        chunk = self.get_task_data(pb.TaskDataRequest(task_id=task_id))
        return pa.ipc.open_stream(io.BytesIO(chunk.arrow_ipc)).read_all()

    def close(self):
        self._channel.close()


class WorkerAgent:
    """Worker lifecycle: register → heartbeat loop → serve
    (≙ worker main.rs:14-52). On TPU the fragment executor is the SPMD
    program, so the agent's job is membership + liveness."""

    def __init__(self, coordinator_address: str, address: str = "",
                 num_devices: int = 1, device_kind: str = "unknown"):
        self.worker_id = str(uuid.uuid4())
        self.coordinator = CoordinatorClient(coordinator_address)
        self.info = pb.WorkerInfo(worker_id=self.worker_id, address=address,
                                  num_devices=num_devices,
                                  device_kind=device_kind)
        self.process_index = None
        self._stop = threading.Event()
        self._thread = None

    def start(self):
        ack = self.coordinator.register_worker(self.info)
        if not ack.accepted:
            raise RuntimeError(f"registration rejected: {ack.message}")
        self.process_index = ack.process_index
        self._thread = threading.Thread(target=self._heartbeat_loop,
                                        daemon=True)
        self._thread.start()
        return self

    def _heartbeat_loop(self):
        backoff = HEARTBEAT_INTERVAL_S
        while not self._stop.wait(backoff):
            try:
                ack = self.coordinator.send_heartbeat(
                    pb.Heartbeat(worker_id=self.worker_id,
                                 unix_time=time.time()))
                if not ack.ok:          # unknown → re-register
                    self.coordinator.register_worker(self.info)
                backoff = HEARTBEAT_INTERVAL_S
            except grpc.RpcError:
                # retry with backoff (the reference logs-and-ignores with a
                # TODO for this, worker main.rs:35-38)
                backoff = min(backoff * 2, 60.0)

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
        self.coordinator.close()


def bootstrap_jax_distributed(coordinator_address: str | None = None,
                              num_processes: int | None = None,
                              process_id: int | None = None) -> None:
    """Multi-host bootstrap: `jax.distributed.initialize` is the TPU-native
    RegisterWorker (SURVEY §3.5) — after it, `jax.devices()` spans the
    whole slice and `shard_map` programs run across hosts."""
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
