"""API edge: Arrow Flight data plane + gRPC control plane.

≙ /root/reference/crates/api (IglooFlightSqlService + coordinator/worker
gRPC protos). Message classes in cluster_pb2.py are generated from
protos/cluster.proto via `protoc --python_out` (regenerate with
scripts/gen_protos.sh).
"""
