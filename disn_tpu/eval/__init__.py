from disn_tpu.eval.metrics import (  # noqa: F401
    nn_distance, approx_match, match_cost, chamfer_emd, f_score, iou_volumes,
    sample_mesh_surface,
)
