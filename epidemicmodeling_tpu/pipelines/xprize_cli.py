"""XPRIZE entry point as a command line.

Reference behavior: testScripts/testPrescribeXPRIZE02.m — the Phase-II XPRIZE
driver: configure dates, the 12 Oxford NPIs with codebook maxima (:24-38), a
log+linear epsilon grid (:49-53) and per-geo cost weights (:56-58), then run
the full TrainPredictPrescribeNPI pipeline (:71). Output follows the XPRIZE
prescription schema (PrescriptionIndex, CountryName, RegionName, Date,
<NPI columns>) plus the predictions schema.

Usage:
    python -m epidemicmodeling_tpu.pipelines.xprize_cli \
        --data oxford.csv --geos countries_regions.csv \
        --populations populations.csv \
        --start-train 2020-03-01 --end-train 2021-01-01 \
        --end-predict 2021-03-31 \
        --costs uniform_random_costs.csv \
        --prescriptions-out presc.csv --predictions-out pred.csv
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def build_arg_parser() -> argparse.ArgumentParser:
    """CLI surface mirroring testPrescribeXPRIZE02.m's configuration block
    (dates, NPI maxima, epsilon grid, cost weights, output CSVs)."""
    ap = argparse.ArgumentParser(
        prog="epidemicmodeling_tpu.pipelines.xprize_cli",
        description="Train-predict-prescribe NPI pipeline (XPRIZE driver)")
    ap.add_argument("--data", required=True,
                    help="OxCGRT CSV (cases, deaths, NPI columns)")
    ap.add_argument("--geos", required=True,
                    help="countries_regions.csv listing GeoIDs to process")
    ap.add_argument("--populations", required=True,
                    help="populations.csv")
    ap.add_argument("--costs", default=None,
                    help="NPI cost-weight CSV (per-geo rows); default: "
                         "equal weights")
    ap.add_argument("--start-train", required=True)
    ap.add_argument("--end-train", required=True)
    ap.add_argument("--start-regression", default=None,
                    help="default: --start-train")
    ap.add_argument("--end-predict", required=True)
    ap.add_argument("--num-epsilon", type=int, default=250,
                    help="epsilon grid size (testPrescribeXPRIZE02.m:49)")
    ap.add_argument("--num-prescriptions", type=int, default=10,
                    help="PrescriptionIndex blocks written (evenly spaced "
                         "over the epsilon sweep)")
    ap.add_argument("--prescriptions-out", default="prescriptions.csv")
    ap.add_argument("--predictions-out", default=None,
                    help="optional predictions CSV (fixed-NPI scenario)")
    ap.add_argument("--trained-params-out", default=None,
                    help="optional .npz checkpoint of trained coefficients")
    ap.add_argument("--load-params", default=None,
                    help=".npz checkpoint to prescribe from WITHOUT "
                         "retraining (testPrescribeXPRIZE01.m flow)")
    ap.add_argument("--future-ip", default=None,
                    help="future intervention plan CSV (future_ip.csv "
                         "schema); predictions are conditioned on it "
                         "instead of the frozen-last-NPI scenario")
    ap.add_argument("--summary-out", default=None,
                    help="optional JSON summary (costs, front sizes)")
    ap.add_argument("--backend", default="pallas",
                    choices=["vmap", "lanes", "pallas"],
                    help="compute backend (pallas falls back to lanes off-TPU)")
    ap.add_argument("--pareto-chunk", type=int, default=32)
    ap.add_argument("--observation-type", default="NEWCASES",
                    choices=["NEWCASES", "TOTALCASES"],
                    help="EKF observation model (SIAlphaModelEKF.m:51-58)")
    ap.add_argument("--num-monte-carlo", type=int, default=500,
                    help="random-NPI baseline rollouts per region "
                         "(TrainPredictPrescribeNPI.m:497)")
    ap.add_argument("--stochastic-forecast", action="store_true",
                    help="inject process noise into the forecast rollouts "
                         "(SIalpha_Controlled.m noise terms; default: "
                         "deterministic)")
    ap.add_argument("--cpu-devices", type=int, default=None,
                    help="force the CPU platform with N virtual devices "
                         "(smoke-tests --mesh without TPU hardware; the "
                         "environment may pin another platform via "
                         "sitecustomize, so this uses jax.config.update "
                         "which must run before any computation)")
    ap.add_argument("--mesh", default=None,
                    help="run SPMD over a device mesh: 'auto' uses all "
                         "visible devices (dp x ep factorization), or "
                         "'DPxEP' explicitly, e.g. '4x2'. Default: single "
                         "device")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--float64", action="store_true",
                    help="run in float64 (CPU parity mode)")
    return ap


def main(argv=None) -> int:
    """Run the full train-predict-prescribe driver; writes the XPRIZE
    prescriptions/predictions CSVs and returns a process exit code."""
    args = build_arg_parser().parse_args(argv)

    import jax
    if args.cpu_devices:
        from ..utils.platform import force_cpu_devices
        if not force_cpu_devices(args.cpu_devices):
            raise SystemExit(
                f"--cpu-devices {args.cpu_devices}: could not force the "
                "CPU platform (backend already initialized?)")
    import jax.numpy as jnp
    from ..control import epsilon_grid
    from ..data import NPI_MAXES_DEFAULT, OXFORD_NPI_COLUMNS
    from ..data.oxford import load_geo_list, load_npi_costs
    from ..data.xprize_io import write_predictions_csv, write_prescriptions_csv
    from .config import PipelineConfig
    from .train_predict_prescribe import train_predict_prescribe

    P = len(OXFORD_NPI_COLUMNS)
    geo_ids = load_geo_list(args.geos)
    if args.costs:
        npi_weights = load_npi_costs(args.costs, geo_ids)
    else:
        npi_weights = np.ones(P)

    backend = args.backend
    from epidemicmodeling_tpu.ops.pallas import should_interpret
    if backend == "pallas" and should_interpret():
        print("note: pallas backend requested off-TPU; using lanes",
              file=sys.stderr)
        backend = "lanes"
    cfg = PipelineConfig(backend=backend, pareto_chunk=args.pareto_chunk,
                         observation_type=args.observation_type,
                         num_monte_carlo=args.num_monte_carlo,
                         stochastic_forecast=args.stochastic_forecast)

    trained = None
    if args.load_params:
        if str(args.load_params).endswith(".mat"):
            from .checkpoint import load_trained_params_mat
            trained = load_trained_params_mat(args.load_params)
        else:
            from .checkpoint import load_trained_params
            trained = load_trained_params(args.load_params)
        print(f"loaded trained parameters for {len(trained.names)} geos "
              f"from {args.load_params}")

    mesh = None
    if args.mesh:
        from ..parallel import make_mesh
        from jax.sharding import Mesh
        if args.mesh == "auto":
            mesh = make_mesh()
        else:
            dp, ep = (int(v) for v in args.mesh.lower().split("x"))
            devs = jax.devices()
            if dp * ep > len(devs):
                raise SystemExit(f"--mesh {args.mesh} needs {dp * ep} "
                                 f"devices, found {len(devs)}")
            mesh = Mesh(np.array(devs[:dp * ep]).reshape(dp, ep),
                        ("dp", "ep"))
        print(f"mesh: {dict(mesh.shape)} over {mesh.devices.size} devices",
              file=sys.stderr)

    eps = np.asarray(epsilon_grid(args.num_epsilon))
    res = train_predict_prescribe(
        npi_weights=npi_weights,
        epsilon_values=eps,
        start_train_date=args.start_train,
        end_train_date=args.end_train,
        start_regression_date=args.start_regression or args.start_train,
        end_predict_date=args.end_predict,
        data_file=args.data,
        geo_file=args.geos,
        populations_file=args.populations,
        npi_mins=np.zeros(P),
        npi_maxes=NPI_MAXES_DEFAULT,
        trained_params_file=args.trained_params_out,
        cfg=cfg,
        key=jax.random.PRNGKey(args.seed),
        dtype=jnp.float64 if args.float64 else None,
        trained=trained,
        mesh=mesh,
    )

    names = list(res.trained.names)
    E = res.pareto["J0"].shape[0]
    n_presc = min(args.num_prescriptions, E)
    sel = np.unique(np.linspace(0, E - 1, n_presc).round().astype(int))
    u = np.asarray(res.pareto["u_prescribed"])[sel]    # (n, R, H, P)
    # prescriptions start the day after training ends
    from ..utils.dates import date_range_days
    presc_start = date_range_days(args.end_train, 2)[1]
    write_prescriptions_csv(args.prescriptions_out, names, presc_start, u)
    print(f"wrote {args.prescriptions_out}: {len(sel)} prescription indices "
          f"x {len(names)} geos x {u.shape[2]} days")

    if args.predictions_out:
        pop = np.asarray(res.trained.population)[:, None]
        sc = res.scenarios["fixed"]
        T_hist = np.asarray(sc.s).shape[1] - u.shape[2]
        if args.future_ip:
            from ..data import read_future_ip
            from .core import region_init, scenario_from_schedule
            from ..utils.dates import date_range_days
            H = u.shape[2]
            u_plan = read_future_ip(args.future_ip, names, presc_start,
                                    date_range_days(presc_start, H)[-1])
            u_plan = np.minimum(u_plan, np.asarray(NPI_MAXES_DEFAULT))
            init = region_init(res.batch_train, cfg)
            sc = scenario_from_schedule(
                res.batch_full, res.trained, init, res.s_hist, u_plan,
                npi_weights, np.zeros(P), NPI_MAXES_DEFAULT, T_hist, cfg)
        cases = np.asarray(sc.s * sc.i * sc.alpha) * pop  # (R, T_full)
        write_predictions_csv(args.predictions_out, names, presc_start,
                              cases[:, T_hist:])
        print(f"wrote {args.predictions_out}"
              + (" (conditioned on future-IP plan)" if args.future_ip
                 else ""))

    if args.summary_out:
        summary = {
            "geos": names,
            "epsilon": [float(e) for e in eps],
            "prescription_epsilon_indices": [int(i) for i in sel],
            "J0_mean_per_eps": np.asarray(res.pareto["J0"]).mean(1).tolist(),
            "J1_mean_per_eps": np.asarray(res.pareto["J1"]).mean(1).tolist(),
            "pareto_front_sizes": np.asarray(res.pareto_front).sum(0).tolist(),
        }
        with open(args.summary_out, "w") as f:
            json.dump(summary, f)
        print(f"wrote {args.summary_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
