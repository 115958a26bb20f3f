from chameleonrt_tpu.parallel.sharded import (  # noqa: F401
    AXIS,
    make_mesh,
    make_sharded_render_step,
    replicate_scene,
    shard_accum,
)
