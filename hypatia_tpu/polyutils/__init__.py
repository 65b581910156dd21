from hypatia_tpu.polyutils.domains import (
    Domain, FreeDomain, BoxDomain, BallDomain, EllipsoidDomain,
)
from hypatia_tpu.polyutils.interp import interpolate, get_L, get_U
