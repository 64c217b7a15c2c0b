"""ctypes loader/builder for the native EKF library."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "newcase_ekf.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libnewcase_ekf.so")
_lib_handle = None


def build_library(force: bool = False) -> str:
    """Compile the shared library if missing/stale. Returns its path."""
    if (not force and os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           "-pthread", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _get_lib():
    global _lib_handle
    if _lib_handle is None:
        path = build_library()
        _lib_handle = ctypes.CDLL(path)
        d = ctypes.POINTER(ctypes.c_double)
        _lib_handle.newcase_ekf_optimal_npi.restype = ctypes.c_int
        _lib_handle.newcase_ekf_optimal_npi.argtypes = [
            d, d, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double,
            d, d, d, d,       # a, u_min, u_max, w
            d, d, d, d,       # s_init, Ps_init, s_final, Ps_final
            d, d,             # Q, R_v
            ctypes.c_double, ctypes.c_double, ctypes.c_int,
            d, d, d,          # outputs
        ]
        _lib_handle.newcase_ekf_pareto_sweep.restype = ctypes.c_int
        _lib_handle.newcase_ekf_pareto_sweep.argtypes = [
            d, d, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double,
            d, ctypes.c_int,  # eps_values, n_eps
            d, d, d, d,       # a, u_min, u_max, w
            d, d, d, d,       # s_init, Ps_init, s_final, Ps_final
            d, d,             # Q, R_v
            ctypes.c_double, ctypes.c_double, ctypes.c_int,
            d, ctypes.c_int,  # sia_hist, n_threads
            d, d, d,          # U_OPT_SMOOTH, J0, J1
        ]
    return _lib_handle


def _cptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def newcase_ekf_optimal_npi_native(u, x, params, s_init, Ps_init,
                                   s_final, Ps_final, Q, R_v,
                                   beta_ekf=1.0, gamma_ekf=0.995,
                                   inv_monitor_len=21):
    """Run the native EKF/EKS. u: (T, P) with NaN = optimal control; x: (T,)
    with NaN = prediction only; params: the SIAlphaParams dict (host side).
    Returns dict with S_PLUS (T,6), S_SMOOTH (T,6), U_OPT_SMOOTH (T,P)."""
    lib = _get_lib()
    u = np.ascontiguousarray(np.asarray(u, float))
    x = np.ascontiguousarray(np.asarray(x, float).reshape(-1))
    T, P = u.shape
    if x.shape[0] != T:
        raise ValueError(f"x length {x.shape[0]} != u time dim {T}")
    if P > 64:
        raise ValueError(f"NPI dim {P} exceeds the native build limit (64)")
    g = lambda k: float(np.asarray(params[k]))
    arr = lambda k: np.ascontiguousarray(np.asarray(params[k], float)
                                         .reshape(-1))
    a_c, u_min, u_max, w = arr("a"), arr("u_min"), arr("u_max"), arr("w")
    for name, v in (("a", a_c), ("u_min", u_min), ("u_max", u_max),
                    ("w", w)):
        if v.shape[0] != P:
            raise ValueError(
                f"params[{name!r}] length {v.shape[0]} != NPI dim {P}")
    s_init = np.ascontiguousarray(np.asarray(s_init, float).reshape(6))
    Ps_init = np.ascontiguousarray(np.asarray(Ps_init, float).reshape(6, 6))
    s_final = np.ascontiguousarray(np.asarray(s_final, float).reshape(6))
    Ps_final = np.ascontiguousarray(np.asarray(Ps_final, float).reshape(6, 6))
    Q = np.ascontiguousarray(np.asarray(Q, float).reshape(6, 6))
    R_v = np.ascontiguousarray(
        np.broadcast_to(np.asarray(R_v, float).reshape(-1), (T,)).copy())

    S_PLUS = np.zeros((T, 6))
    S_SMOOTH = np.zeros((T, 6))
    U_SM = np.zeros((T, P))
    rc = lib.newcase_ekf_optimal_npi(
        _cptr(u), _cptr(x), T, P,
        g("dt"), g("beta"), g("gamma"), g("b"), g("epsilon"), g("sigma"),
        g("alpha_min"), g("alpha_max"),
        _cptr(a_c), _cptr(u_min), _cptr(u_max), _cptr(w),
        _cptr(s_init), _cptr(Ps_init), _cptr(s_final), _cptr(Ps_final),
        _cptr(Q), _cptr(R_v),
        float(beta_ekf), float(gamma_ekf), int(inv_monitor_len),
        _cptr(S_PLUS), _cptr(S_SMOOTH), _cptr(U_SM))
    if rc != 0:
        raise RuntimeError(f"native EKF failed with code {rc}")
    return {"S_PLUS": S_PLUS, "S_SMOOTH": S_SMOOTH, "U_OPT_SMOOTH": U_SM}


def newcase_ekf_pareto_sweep_native(u, x, T_hist, params, eps_values,
                                    s_init, Ps_init, s_final, Ps_final,
                                    Q, R_v, sia_hist, beta_ekf=1.0,
                                    gamma_ekf=0.995, inv_monitor_len=21,
                                    n_threads=0):
    """Threaded full Pareto epsilon sweep for one region (the serving-side
    testPrescribeXPRIZE01 flow: per epsilon opt-controlled EKF/EKS +
    horizon re-simulation + NPICost). params: SIAlphaParams dict whose
    "epsilon" is ignored; sia_hist: (T_hist, 3) historic (s, i, alpha)
    trajectory; n_threads=0 uses all hardware threads. Returns dict with
    U_OPT_SMOOTH (E, T, P), J0 (E,), J1 (E,)."""
    lib = _get_lib()
    u = np.ascontiguousarray(np.asarray(u, float))
    x = np.ascontiguousarray(np.asarray(x, float).reshape(-1))
    T, P = u.shape
    eps = np.ascontiguousarray(np.asarray(eps_values, float).reshape(-1))
    E = eps.shape[0]
    g = lambda k: float(np.asarray(params[k]))
    arr = lambda k: np.ascontiguousarray(np.asarray(params[k], float)
                                         .reshape(-1))
    a_c, u_min, u_max, w = arr("a"), arr("u_min"), arr("u_max"), arr("w")
    s_init = np.ascontiguousarray(np.asarray(s_init, float).reshape(6))
    Ps_init = np.ascontiguousarray(np.asarray(Ps_init, float).reshape(6, 6))
    s_final = np.ascontiguousarray(np.asarray(s_final, float).reshape(6))
    Ps_final = np.ascontiguousarray(np.asarray(Ps_final, float).reshape(6, 6))
    Q = np.ascontiguousarray(np.asarray(Q, float).reshape(6, 6))
    R_v = np.ascontiguousarray(
        np.broadcast_to(np.asarray(R_v, float).reshape(-1), (T,)).copy())
    sia_hist = np.ascontiguousarray(
        np.asarray(sia_hist, float).reshape(int(T_hist), 3))

    U_SM = np.zeros((E, T, P))
    J0 = np.zeros(E)
    J1 = np.zeros(E)
    rc = lib.newcase_ekf_pareto_sweep(
        _cptr(u), _cptr(x), T, P, int(T_hist),
        g("dt"), g("beta"), g("gamma"), g("b"), g("sigma"),
        g("alpha_min"), g("alpha_max"),
        _cptr(eps), E,
        _cptr(a_c), _cptr(u_min), _cptr(u_max), _cptr(w),
        _cptr(s_init), _cptr(Ps_init), _cptr(s_final), _cptr(Ps_final),
        _cptr(Q), _cptr(R_v),
        float(beta_ekf), float(gamma_ekf), int(inv_monitor_len),
        _cptr(sia_hist), int(n_threads),
        _cptr(U_SM), _cptr(J0), _cptr(J1))
    if rc != 0:
        raise RuntimeError(f"native Pareto sweep failed with code {rc}")
    return {"U_OPT_SMOOTH": U_SM, "J0": J0, "J1": J1}
