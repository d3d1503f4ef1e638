from .dist import batch_axes, init_distributed, make_hybrid_mesh
from .pp import make_pp_mesh, pp_forward_fn, pp_kv_create, pp_put, stage_params
from .tp import (
    TpPlan,
    kv_spec,
    make_mesh,
    plan_for,
    shard_params,
    sharded_forward_fn,
)
