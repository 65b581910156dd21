from hypatia_tpu.models.model import Model, build_cone_idxs
