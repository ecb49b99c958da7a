from .sharding import (  # noqa: F401
    make_mesh,
    mk_gate_shardings,
    shard_mk_gate,
)
