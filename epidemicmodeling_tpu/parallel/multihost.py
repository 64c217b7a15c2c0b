"""Multi-host (multi-process) SPMD execution and its dryrun harness.

The reference is a single MATLAB process (SURVEY.md §2.10); scaling beyond
one host maps its embarrassingly-parallel region x epsilon loop nest onto a
mesh that SPANS processes:

    dp (regions)  — across hosts: each host's processes own a region shard;
                    there are no hot-loop collectives between lanes, so DCN
                    carries only program launch and the final cost gathers.
    ep (ensemble) — within a host, so any cross-epsilon reduction
                    (Pareto-front mask, optimal-index select) rides ICI.

Mechanics: every process calls ``jax.distributed.initialize`` against a
shared coordinator, sees the same GLOBAL device list, builds the same Mesh,
and materializes identical host data as global arrays shard-by-shard
(``parallel.mesh.put_global``). ``jit`` then runs one GSPMD program across
all processes — the same code path as single-host, which is the point: the
pipeline itself contains no multi-host special cases.

The dryrun harness validates this without real multi-host hardware: N
OS processes x M virtual CPU devices each (xla_force_host_platform_device
_count), Gloo collectives over localhost standing in for DCN, and a J0
parity pin against the identical single-process run.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _set_device_count_flag(flags: str, n: int) -> str:
    """Force xla_force_host_platform_device_count=n, REPLACING any existing
    value — a parent test harness (conftest) exports its own count and a
    child that merely appends-if-absent would inherit the wrong mesh size."""
    kept = [t for t in flags.split()
            if "xla_force_host_platform_device_count" not in t]
    kept.append(f"--xla_force_host_platform_device_count={n}")
    return " ".join(kept)


def init_distributed(coordinator: str, num_processes: int, process_id: int,
                     local_devices: int,
                     collective_timeout_s: int = 1800) -> None:
    """Join the distributed runtime with ``local_devices`` virtual CPU
    devices. Must run before any jax computation in this process: the
    platform pin and the XLA device-count flag are both backend-init-time
    settings (env-var JAX_PLATFORMS alone is too late under the axon
    sitecustomize — see utils/platform.force_cpu_devices).

    collective_timeout_s raises XLA:CPU's OP-level collective deadline
    (default 30 s: how long an executing collective waits for its peers).
    It does NOT raise the Gloo rendezvous GetKeyValue deadline — measured:
    a run with this flag at 1800 still died at 29.99 s in connectFullMesh
    — which is why _warm_gloo_cliques exists (see CLAUDE.md "Multi-host
    Gloo survival rules"). Cold XLA:CPU compiles on a contended host skew
    the processes' dispatch times by MINUTES (one hits the shared
    persistent cache where the other compiles), so both deadlines matter."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    flags = _set_device_count_flag(
        os.environ.get("XLA_FLAGS", ""), local_devices)
    if "xla_cpu_collective_timeout_seconds" not in flags:
        flags += f" --xla_cpu_collective_timeout_seconds={collective_timeout_s}"
    os.environ["XLA_FLAGS"] = flags
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_multihost_mesh(ep: int | None = None, n_total: int | None = None,
                        axis_names=("dp", "ep")):
    """Global-device mesh with dp spanning processes and ep within one.

    jax.devices() orders devices process-major, so reshaping to
    (n_global // ep, ep) with ep <= devices-per-process puts consecutive
    same-process devices on the ep axis and spreads dp across processes —
    the DCN layout documented above. Pass ``ep`` explicitly to pin the
    factorization (the dryrun's single-process reference does, so both
    runs use the identical mesh shape and device order).
    """
    import jax

    devs = jax.devices()
    if n_total is not None:
        devs = devs[:n_total]     # a harness may over-provision devices
    n = len(devs)
    if ep is None:
        local = len(jax.local_devices())
        ep = max(k for k in range(1, local + 1)
                 if n % k == 0 and local % k == 0)
    from jax.sharding import Mesh
    return Mesh(np.array(devs).reshape(n // ep, ep), axis_names)


def _enable_cache() -> None:
    """Point the child at the repo's machine-keyed persistent XLA cache.
    The dryrun's cost is ~entirely XLA:CPU compile time (measured 82 s
    compile vs 0.1 s execute per process at the dryrun shapes), so cache
    hits from a previous dryrun/test run on the same host class turn the
    whole harness from minutes into seconds."""
    import jax

    from ..utils.jax_cache import enable_persistent_cache
    enable_persistent_cache(jax, _repo_root())


def _warm_gloo_cliques(mesh) -> None:
    """Pre-establish every Gloo communicator clique the mesh programs can
    need (full mesh + each axis's cross-device groups) with tiny psums.

    Gloo context creation has a hard ~30 s key-value rendezvous timeout
    baked into XLA:CPU, and it fires lazily at the FIRST collective of an
    executing program. On a contended host, cold XLA:CPU compiles skew the
    workers' dispatch times far past 30 s (observed: one worker hits the
    persistent cache and dispatches instantly while the other compiles for
    minutes -> DEADLINE_EXCEEDED in connectFullMesh). Running these
    trivial collectives immediately after jax.distributed.initialize —
    while the processes are still synchronized by the init barrier — puts
    every clique in XLA:CPU's communicator cache, making all later
    collectives immune to compile skew."""
    import jax
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, PartitionSpec as P

    from .mesh import put_global

    def _psum_all(m) -> None:
        names = tuple(m.axis_names)
        ones = put_global(
            np.ones(tuple(m.shape[a] for a in names), np.float32),
            m, P(*names))
        for axes in [(a,) for a in names] + [names]:
            out_spec = P(*(None if a in axes else a for a in names))
            fn = jax.jit(jax.shard_map(
                lambda x, _axes=axes: jax.lax.psum(x, _axes), mesh=m,
                in_specs=P(*names), out_specs=out_spec))
            jax.block_until_ready(fn(ones))

    _psum_all(mesh)
    # XLA enumerates a collective's participants in the op's OWN replica-
    # group order, and the Gloo clique key is that ordered list — so the
    # row-major warmup above does not cover ops that group the same
    # devices column-major (observed: cpu:gloo/0,2048,1,2049 timing out
    # with the 0,1,2048,2049 clique already warm). Warm the transposed
    # mesh too: for the 2-axis dryrun mesh, row-major + column-major +
    # both axes' pair groups exhaust every grouping XLA can emit.
    _psum_all(Mesh(mesh.devices.T, tuple(reversed(mesh.axis_names))))
    # the result-gather clique is keyed on yet another enumeration — warm
    # it with the same utility the gather uses
    multihost_utils.process_allgather(np.zeros(1, np.float32), tiled=True)


def _coord_barrier(name: str, timeout_s: int = 1800) -> None:
    """Synchronize all processes via the coordination service (plain gRPC
    to the coordinator — no Gloo, no collective compile). Used wherever
    processes must rendezvous after an unboundedly-skewed phase (cold XLA
    compiles): Gloo's ~30 s rendezvous/op deadlines cannot absorb that
    skew, but this barrier's timeout is ours to set."""
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(name, timeout_s * 1000)


def _worker(out_path: str, coordinator: str, num_processes: int,
            process_id: int, local_devices: int, R: int, E: int,
            T_hist: int, horizon: int, backend: str) -> None:
    init_distributed(coordinator, num_processes, process_id, local_devices)
    _enable_cache()
    import jax
    from jax.experimental import multihost_utils

    from .mesh import sharded_train_prescribe_step

    mesh = make_multihost_mesh(ep=local_devices)
    _warm_gloo_cliques(mesh)
    out = sharded_train_prescribe_step(mesh, R=R, E=E, T_hist=T_hist,
                                       horizon=horizon, backend=backend)
    # in-program work is DCN-free by design (inputs replicated, ep intra-
    # process — see module docstring), so local completion needs no peer;
    # then rendezvous on the coordination service before the Gloo gather so
    # compile skew between processes (minutes, cold) can't trip Gloo's
    # ~30 s deadlines (observed on a contended 1-CPU host).
    jax.block_until_ready((out["J0"], out["a2"]))
    _coord_barrier("epi_pre_gather")
    # every process gathers the full (E, R) cost surface; process 0 dumps
    J0 = np.asarray(multihost_utils.process_allgather(
        out["J0"], tiled=True))
    a2 = np.asarray(multihost_utils.process_allgather(
        out["a2"], tiled=True))
    print(f"[worker {process_id}] mesh={dict(mesh.shape)} "
          f"local={len(jax.local_devices())}/{len(jax.devices())} "
          f"J0 {J0.shape} finite={bool(np.isfinite(J0).all())}", flush=True)
    if process_id == 0:
        np.savez(out_path, J0=J0, a2=a2)
    # explicit synchronized teardown: the atexit shutdown path runs at
    # interpreter-exit time, which on a contended 1-CPU host can skew
    # between processes past the 5-min shutdown-barrier deadline (observed:
    # DEADLINE_EXCEEDED with 1/2 tasks at the barrier). Sync while the
    # runtime is fully alive, then shut down deterministically.
    _coord_barrier("epi_multihost_done")
    jax.distributed.shutdown()


def _reference(out_path: str, n_devices: int, ep: int, R: int, E: int,
               T_hist: int, horizon: int, backend: str) -> None:
    """Identical step on ONE process with n_devices virtual devices — the
    parity baseline (no distributed runtime, no Gloo). Uses the workers'
    exact mesh factorization so the two programs are shape-identical."""
    from ..utils.platform import force_cpu_devices

    if not force_cpu_devices(n_devices):
        raise RuntimeError("reference: could not force CPU devices")
    _enable_cache()
    from .mesh import sharded_train_prescribe_step

    mesh = make_multihost_mesh(ep=ep, n_total=n_devices)
    out = sharded_train_prescribe_step(mesh, R=R, E=E, T_hist=T_hist,
                                       horizon=horizon, backend=backend)
    np.savez(out_path, J0=np.asarray(out["J0"]), a2=np.asarray(out["a2"]))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_multihost_dryrun(n_devices: int = 8, n_processes: int = 2,
                         R: int = 4, E: int = 4, T_hist: int = 48,
                         horizon: int = 16, backend: str = "lanes",
                         timeout: int = 1800, verbose: bool = True,
                         summary: bool = False) -> dict:
    """Spawn ``n_processes`` jax.distributed workers (n_devices split evenly
    between them) plus a single-process reference, and pin J0/a2 parity.

    Returns {"J0": ..., "max_abs_diff": ...}; raises on any child failure
    or parity violation. This is part of the `dryrun_multichip` driver
    contract and the SURVEY §2.10 DCN demonstration. verbose=True streams
    the child logs; summary=True prints just the final OK line.
    """
    if n_devices % n_processes:
        raise ValueError(f"{n_devices} devices not divisible by "
                         f"{n_processes} processes")
    local = n_devices // n_processes
    root = _repo_root()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [root, env.get("PYTHONPATH", "")] if p)
    # children must re-init their own backends; scrub any inherited pin
    env.pop("_EPI_DRYRUN_CHILD", None)
    # REPLACE any inherited device-count flag with this dryrun's count: the
    # reference child's force_cpu_devices only appends-if-absent, so e.g. a
    # parent that ran dryrun_multichip(3) would otherwise leak count=3 into
    # a 4-device reference (workers are immune — init_distributed replaces)
    env["XLA_FLAGS"] = _set_device_count_flag(
        env.get("XLA_FLAGS", ""), n_devices)

    with tempfile.TemporaryDirectory() as td:
        wout = os.path.join(td, "worker.npz")
        rout = os.path.join(td, "ref.npz")
        common = ["--R", str(R), "--E", str(E), "--T-hist", str(T_hist),
                  "--horizon", str(horizon), "--backend", backend]
        logs = []
        fail = []

        def _drain(name, p):
            try:
                out, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
                fail.append(f"{name}: timeout after {timeout}s")
            logs.append(f"--- {name} ---\n{out}")
            if p.returncode != 0:
                fail.append(f"{name}: exit {p.returncode}")

        # reference FIRST, alone: it populates the persistent compile cache
        # and a contended host then runs only the two workers concurrently
        # (three-way CPU sharing of cold XLA:CPU compiles was the main
        # source of worker dispatch skew)
        ref = subprocess.Popen(
            [sys.executable, "-m",
             "epidemicmodeling_tpu.parallel.multihost", "reference",
             "--out", rout, "--n-devices", str(n_devices),
             "--local-devices", str(local)] + common,
            env=env, cwd=root, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        _drain("reference", ref)

        procs = []
        if not fail:
            # allocate the coordinator port HERE, right before the workers
            # bind it — picking it before the (serialized, minutes-long)
            # reference run would leave a window in which another process
            # (e.g. the sibling multihost test on a concurrent pytest
            # worker) is handed the same still-unbound port
            coord = f"localhost:{_free_port()}"
            for pid in range(n_processes):
                procs.append(subprocess.Popen(
                    [sys.executable, "-m",
                     "epidemicmodeling_tpu.parallel.multihost", "worker",
                     "--out", wout, "--coordinator", coord,
                     "--num-processes", str(n_processes),
                     "--process-id", str(pid),
                     "--local-devices", str(local)] + common,
                    env=env, cwd=root, stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT, text=True))
        for i, p in enumerate(procs):
            _drain(f"worker{i}", p)
        if verbose:
            print("\n".join(logs), flush=True)
        if fail:
            raise RuntimeError("multihost dryrun failed: " + "; ".join(fail)
                               + "\n" + "\n".join(logs))

        w = np.load(wout)
        r = np.load(rout)
        dj = float(np.max(np.abs(w["J0"] - r["J0"])))
        da = float(np.max(np.abs(w["a2"] - r["a2"])))
        if not (np.isfinite(w["J0"]).all() and dj < 1e-9 and da < 1e-9):
            raise RuntimeError(
                f"multihost parity violation: max|dJ0|={dj:.3e} "
                f"max|da2|={da:.3e}")
        if verbose or summary:
            print(f"multihost dryrun OK [{backend}]: {n_processes} procs x "
                  f"{local} devices, J0 {w['J0'].shape}, "
                  f"max|dJ0| vs single-process = {dj:.2e}", flush=True)
        return {"J0": w["J0"], "max_abs_diff": dj}


def _main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="multihost")
    ap.add_argument("role", choices=["worker", "reference"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--coordinator")
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--n-devices", type=int, default=8)
    ap.add_argument("--R", type=int, default=4)
    ap.add_argument("--E", type=int, default=4)
    ap.add_argument("--T-hist", type=int, default=48)
    ap.add_argument("--horizon", type=int, default=16)
    ap.add_argument("--backend", default="lanes")
    a = ap.parse_args(argv)
    if a.role == "worker":
        _worker(a.out, a.coordinator, a.num_processes, a.process_id,
                a.local_devices, a.R, a.E, a.T_hist, a.horizon, a.backend)
    else:
        _reference(a.out, a.n_devices, a.local_devices, a.R, a.E, a.T_hist,
                   a.horizon, a.backend)


if __name__ == "__main__":
    _main()
