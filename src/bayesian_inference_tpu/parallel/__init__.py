from bayesian_inference_tpu.parallel.mesh import (
    get_mesh,
    make_sharded_log_prob,
    shard_leading_axis,
)

__all__ = ["get_mesh", "make_sharded_log_prob", "shard_leading_axis"]
