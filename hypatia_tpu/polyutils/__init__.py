from hypatia_tpu.polyutils.domains import (
    Domain, FreeDomain, BoxDomain, BallDomain, EllipsoidDomain,
)
from hypatia_tpu.polyutils.interp import interpolate, get_L, get_U
from hypatia_tpu.polyutils.complex import interpolate_complex
