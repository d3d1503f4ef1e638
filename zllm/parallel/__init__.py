from .tp import (
    TpPlan,
    kv_spec,
    make_mesh,
    plan_for,
    shard_params,
    sharded_forward_fn,
)
