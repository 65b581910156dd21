"""Cone oracle library.

Each cone is a static spec object with pure-functional oracles (see
`hypatia_tpu.cones.base.Cone`). Parity target: the 23 predefined cones of the
reference (`src/Cones/Cones.jl:294-310` include list).
"""

from hypatia_tpu.cones.base import Cone
from hypatia_tpu.cones.nonnegative import Nonnegative
from hypatia_tpu.cones.epinormeucl import EpiNormEucl
from hypatia_tpu.cones.matrix_cones import (
    PosSemidefTri,
    DoublyNonnegativeTri,
    LinMatrixIneq,
    HypoRootdetTri,
    HypoPerLogdetTri,
    EpiNormSpectral,
    MatrixEpiPerSquare,
)
from hypatia_tpu.cones.wsos import (
    WSOSInterpNonnegative,
    WSOSInterpPosSemidefTri,
    WSOSInterpEpiNormEucl,
    WSOSInterpEpiNormOne,
)
from hypatia_tpu.cones.sepspectral_matrix import EpiPerSepSpectralMatrix
from hypatia_tpu.cones.epitrrelentropy import EpiTrRelEntropyTri
from hypatia_tpu.cones.psdsparse import (PosSemidefTriSparse,
                                         structured_psd_sparse)
from hypatia_tpu.cones.psdsparse_supernodal import PosSemidefTriSparseSupernodal
from hypatia_tpu.cones.psdbanded import PosSemidefTriBanded
from hypatia_tpu.cones.psdarrow import PosSemidefTriArrow
from hypatia_tpu.cones.sepspectral import (
    EpiPerSepSpectralVector,
    InvSSF,
    NegLogSSF,
    NegEntropySSF,
    Power12SSF,
)
from hypatia_tpu.cones.vector_cones import (
    EpiPerSquare,
    EpiNormInf,
    GeneralizedPower,
    HypoGeoMean,
    HypoPowerMean,
    HypoPerLog,
    EpiRelEntropy,
)

__all__ = [
    "Cone",
    "Nonnegative",
    "EpiNormEucl",
    "EpiPerSquare",
    "EpiNormInf",
    "GeneralizedPower",
    "HypoGeoMean",
    "HypoPowerMean",
    "HypoPerLog",
    "EpiRelEntropy",
    "PosSemidefTri",
    "DoublyNonnegativeTri",
    "LinMatrixIneq",
    "HypoRootdetTri",
    "HypoPerLogdetTri",
    "EpiNormSpectral",
    "MatrixEpiPerSquare",
    "WSOSInterpNonnegative",
    "EpiPerSepSpectralVector",
    "EpiPerSepSpectralMatrix",
    "EpiTrRelEntropyTri",
    "PosSemidefTriSparse",
    "WSOSInterpPosSemidefTri",
    "WSOSInterpEpiNormEucl",
    "WSOSInterpEpiNormOne",
    "InvSSF",
    "NegLogSSF",
    "NegEntropySSF",
    "Power12SSF",
]
