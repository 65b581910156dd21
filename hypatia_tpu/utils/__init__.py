from hypatia_tpu.utils.dtypes import default_tols, eps
