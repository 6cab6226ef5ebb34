from disn_tpu.preprocessing.sdf_gen import (  # noqa: F401
    normalize_mesh, stratified_sample_grid, check_insideout, generate_object,
)
from disn_tpu.preprocessing.img_gen import view_record_from_meta  # noqa: F401
