from disn_tpu.convert.tf_ckpt import (  # noqa: F401
    read_tf_checkpoint, tf_vars_to_params, convert_checkpoint,
)
