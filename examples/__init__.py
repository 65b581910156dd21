"""Example problem generators and benchmark harness.

Parity targets: the reference `examples/` tree (37 families; see SURVEY.md
§2.7). Each module exposes `build(**params) -> Model` and a list of
`MINIMAL`/`FAST` instance parameter dicts used by tests and benchmarks,
mirroring the reference's `*_test.jl` instance sets.
"""

from examples import (
    linearopt, portfolio, doptimaldesign, polymin, relentrentanglement,
    maxvolume, matrixcompletion, discretemaxlikelihood, covarianceest,
    densityest, nearestpsd, experimentdesign, conditionnum,
    lyapunovstability, nonparametricdistr, signomialmin,
    classicalquantum, matrixregression, polyenvelope, sparsepca,
    stabilitynumber, nearestcorrelation, matrixquadratic,
    entanglementassisted, robustgeomprog, sparselmi, semidefinitepoly,
    normconepoly, polynorm, nearestpolymat, centralpolymat,
    convexityparameter, shapeconregr, contraction, lotkavolterra,
    regionofattr,
)
from examples.common import run_instance

FAMILIES = {
    "linearopt": linearopt,
    "portfolio": portfolio,
    "doptimaldesign": doptimaldesign,
    "polymin": polymin,
    "relentrentanglement": relentrentanglement,
    "maxvolume": maxvolume,
    "matrixcompletion": matrixcompletion,
    "discretemaxlikelihood": discretemaxlikelihood,
    "covarianceest": covarianceest,
    "densityest": densityest,
    "nearestpsd": nearestpsd,
    "experimentdesign": experimentdesign,
    "conditionnum": conditionnum,
    "lyapunovstability": lyapunovstability,
    "nonparametricdistr": nonparametricdistr,
    "signomialmin": signomialmin,
    "classicalquantum": classicalquantum,
    "matrixregression": matrixregression,
    "polyenvelope": polyenvelope,
    "sparsepca": sparsepca,
    "stabilitynumber": stabilitynumber,
    "nearestcorrelation": nearestcorrelation,
    "matrixquadratic": matrixquadratic,
    "entanglementassisted": entanglementassisted,
    "robustgeomprog": robustgeomprog,
    "sparselmi": sparselmi,
    "semidefinitepoly": semidefinitepoly,
    "normconepoly": normconepoly,
    "polynorm": polynorm,
    "nearestpolymat": nearestpolymat,
    "centralpolymat": centralpolymat,
    "convexityparameter": convexityparameter,
    "shapeconregr": shapeconregr,
    "contraction": contraction,
    "lotkavolterra": lotkavolterra,
    "regionofattr": regionofattr,
}
