"""Native C++ deployment artifact: the 6-state optimal-NPI EKF/EKS as a
shared library (the framework's equivalent of the reference's MATLAB Coder
C++ codegen project, SURVEY.md §2.9), loaded through ctypes.

Build on demand with ``build_library()`` (g++ -O3 -shared); call through
``newcase_ekf_optimal_npi_native`` with numpy arrays. Pinned against the JAX
implementation by tests/test_deploy.py.
"""

from .native import (build_library, newcase_ekf_optimal_npi_native,
                     newcase_ekf_pareto_sweep_native)

__all__ = ["build_library", "newcase_ekf_optimal_npi_native",
           "newcase_ekf_pareto_sweep_native"]
