from disn_tpu.infer.dense import (  # noqa: F401
    dense_sdf, make_dense_sdf_fn, make_sharded_dense_sdf_fn, scale_pred,
)
