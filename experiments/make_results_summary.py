"""Render RESULTS.md from the experiment outputs.

Collects: the per-tier bench table (BENCH_TABLE.json), the multi-seed UCI
regression/classification metric CSVs (mean +- std over data seeds — the
reference protocol, uci/regression/main.py:455-457), the real-data rows
(breast_wdbc / diabetes_sklearn), the profiler sweeps (CPU + TPU), and the
curve-experiment outputs.

Run after the sweeps:  PYTHONPATH=. python experiments/make_results_summary.py
"""

from __future__ import annotations

import json
import os

import pandas as pd

from experiments.aggregate_seeds import collect, render

ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))


def bench_section() -> str:
    out = ["## Throughput benchmarks (real TPU v5e chip, fp32)\n"]
    try:
        with open(os.path.join(ROOT, "BENCH_BASELINE.json")) as f:
            base = json.load(f)
        out.append(
            f"Reference op sequence (fp64 torch, 1-core CPU): "
            f"**{base['updates_per_sec']:.2f} updates/s** at J=1000, M=512, N=5000.\n"
        )
    except OSError:
        pass
    try:
        with open(os.path.join(ROOT, "BENCH_TABLE.json")) as f:
            table = json.load(f)
        rows = ["| cost | basis | tier | ms/step | updates/s | MFU |", "|---|---|---|---|---|---|"]
        for r in table["rows"]:
            mfu = f"{100 * r['mfu_vs_roof']:.0f}%" if r.get("mfu_vs_roof") else "—"
            rows.append(
                f"| {r['cost']} | {r.get('basis', 'onb')} | {r['tier']} | "
                f"{r['ms_per_step']:.4f} | {r['updates_per_sec']:,.0f} | {mfu} |"
            )
        out.append("\n".join(rows))
        out.append(
            f"\nMFU against the measured {table['config']['roof_tflops']:.0f} TF/s "
            "default-precision matmul roof; spectral tiers are elementwise "
            "(PRNG-bound), so MFU is not meaningful there.\n"
        )
    except OSError:
        out.append("(BENCH_TABLE.json missing — run `python bench.py --table`)\n")
    try:
        with open(os.path.join(ROOT, "BENCH_PREDICT.json")) as f:
            pred = json.load(f)
        cfg = pred["config"]
        out.append(
            "### Serving path (predictive sampling throughput)\n\n"
            f"Exact joint predictive draw vs chunked serving "
            f"(`PLS.predict_samples(chunk_size={cfg['chunk']})`), "
            f"N*={cfg['n_star']}, J={cfg['J']} particles, "
            f"device {cfg['device']}:\n"
        )
        rows = ["| mode | sec | points/s | sample draws/s |", "|---|---|---|---|"]
        for r in pred["rows"]:
            rows.append(
                f"| {r['mode']} | {r['sec']:.3f} | {r['points_per_sec']:,.0f} | "
                f"{r['sample_draws_per_sec']:,.0f} |"
            )
        out.append("\n".join(rows) + "\n")
    except OSError:
        pass
    return "\n".join(out)


SNAPSHOT_DIR = os.path.join(ROOT, "results", "section_snapshots")


def _snapshot(name: str, content: str) -> str:
    """Persist a live-rendered section / fall back to the committed snapshot.

    The curve-family sections render from gitignored per-run artifacts
    (checkpoint pickles, per-curve metric CSVs) that a clean clone does not
    have. When the artifacts are present the live render wins and refreshes
    the committed snapshot; otherwise the snapshot keeps `make results`
    reproducing the full RESULTS.md. Each snapshot is the verbatim section
    from the last run whose artifacts existed.

    A PARTIAL live render (the curve sections skip curves whose artifacts are
    missing, so a one-curve rerun yields a one-row table) must not clobber the
    committed full record — mirroring the merge-never-clobber contract the CSV
    path honours. Refresh only when the live render's table has at least as
    many rows as the snapshot's; otherwise serve the snapshot."""

    def _table_rows(text: str) -> int:
        return sum(
            1 for line in text.splitlines() if line.startswith("| ")
        )

    path = os.path.join(SNAPSHOT_DIR, f"{name}.md")
    existing = None
    if os.path.exists(path):
        with open(path) as f:
            existing = f.read()
    if content:
        if existing is not None and _table_rows(content) < _table_rows(existing):
            print(
                f"[snapshot] {name}: live render has {_table_rows(content)} table "
                f"rows < committed {_table_rows(existing)} — keeping the snapshot "
                "(partial rerun)"
            )
            return existing
        os.makedirs(SNAPSHOT_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write(content)
        return content
    return existing if existing is not None else ""


def uci_section(name: str, outputs: str, metrics: list[str], note: str) -> str:
    out = [f"## {name}\n", note + "\n"]
    for split in ("train", "test"):
        long = collect(os.path.join(ROOT, outputs), split)
        if long.empty:
            out.append(f"({split}: no results yet)\n")
            continue
        out.append(f"### {split} split\n")
        out.append(render(long, metrics))
    return "\n".join(out)


def profiler_section() -> str:
    out = ["## Profiler protocol (reference N/M/T/J sweep shape, 10 seeds)\n"]
    for label, candidates in [
        ("CPU backend", ["results/profiler_cpu", "experiments/profiler/outputs"]),
        ("TPU v5e", ["results/profiler_tpu", "experiments/profiler/outputs_tpu"]),
    ]:
        base = next(
            (
                os.path.join(ROOT, c)
                for c in candidates
                if os.path.isdir(os.path.join(ROOT, c))
            ),
            None,
        )
        if base is None:
            continue
        out.append(f"### {label}\n")
        rows = ["| axis | model | first → last (mean ms over seeds) |", "|---|---|---|"]
        for axis in sorted(os.listdir(base)):
            if not axis.endswith(".csv"):
                continue
            df = pd.read_csv(os.path.join(base, axis))
            g = df.groupby(["model", "value"])["wall_time_milliseconds"].mean()
            for model in df["model"].unique():
                sel = g.loc[model]
                rows.append(
                    f"| {axis[:-4]} | {model} | {sel.iloc[0]:.1f} → {sel.iloc[-1]:.1f} |"
                )
        out.append("\n".join(rows) + "\n")
    return "\n".join(out)


def _curve_table(outputs_dirname: str) -> list[str] | None:
    import glob
    import pickle

    base = os.path.join(
        ROOT, "experiments", "curves", "regression", outputs_dirname, "models"
    )
    if not os.path.isdir(base):
        return None
    rows = []
    for path in sorted(glob.glob(os.path.join(base, "*", "pls-onb.pkl"))):
        curve = os.path.basename(os.path.dirname(path))
        with open(path, "rb") as f:
            payload = pickle.load(f)
        lr = payload.get("best_lr")
        rows.append(
            f"| {curve} | {lr:.1e} | {payload.get('number_of_epochs')} | "
            f"{float(payload.get('observation_noise')):.4f} |"
            if lr is not None
            else f"| {curve} | (no candidate kept) | — | — |"
        )
    return rows or None


def curves_section() -> str:
    """Selected step size / epochs / learned observation noise per curve from
    the curve-regression checkpoints (sigma_true=0.2 => true noise var 0.04).

    Headline = the preconditioned-discretisation run (outputs_precond): the
    stable integrator keeps a candidate on ALL 10 curves; the explicit-Euler
    parity run (outputs) follows for comparison (curves 1/10 keep none
    there)."""
    out = []
    precond = _curve_table("outputs_precond")
    euler = _curve_table("outputs")
    if precond:
        out += [
            "## Curve regression (FULL reference config, sigma_true=0.2 => true noise variance 0.04)\n",
            "Headline run: `discretisation: preconditioned` (same stationary\n"
            "posterior; the stable integrator keeps a step-size candidate on\n"
            "all 10 curves — explicit Euler kept none on curves 1/10).\n",
            "| curve | selected step size | epochs | learned obs. noise |",
            "|---|---|---|---|",
            *precond,
            "",
        ]
    if euler:
        out += [
            "### Parity run (explicit Euler, the reference's scheme)\n",
            "| curve | selected step size | epochs | learned obs. noise |",
            "|---|---|---|---|",
            *euler,
            "",
        ]
    if not out:
        return ""
    out.append(
        "The step-size search + tempering recover the true noise variance "
        "where the search converges; see also "
        "`results/onb_scaling_comparison.md` for the reference-vs-nystrom "
        "ONB scaling comparison on the same curves.\n"
    )
    return "\n".join(out)


def _curve_metric(task: str, curve: str, model: str, metric: str) -> float | None:
    path = os.path.join(
        ROOT, "experiments", "curves", task, "outputs", "results", curve, model,
        f"{metric}_test.csv",
    )
    if not os.path.exists(path):
        return None
    with open(path) as f:
        lines = f.read().strip().splitlines()
    try:
        return float(lines[-1].split(",")[1])
    except (IndexError, ValueError):
        return None


def _curve_order() -> list[str]:
    return [f"curve{i}" for i in range(1, 11)]


def curve_classification_section() -> str:
    """Per-curve test metrics from the round-2 FULL-config classification
    curve run (Dirichlet-learned kernels). The synthetic Bernoulli curves
    have low Bayes accuracy; NLL is the discriminating metric."""
    rows = []
    for curve in _curve_order():
        pls_nll = _curve_metric("classification", curve, "pls-onb-sigmoid", "nll")
        svgp_nll = _curve_metric("classification", curve, "svgp-c", "nll")
        pls_acc = _curve_metric("classification", curve, "pls-onb-sigmoid", "acc")
        svgp_acc = _curve_metric("classification", curve, "svgp-c", "acc")
        if pls_nll is None or svgp_nll is None:
            continue
        pls_acc = float("nan") if pls_acc is None else pls_acc
        svgp_acc = float("nan") if svgp_acc is None else svgp_acc
        winner = "**pls**" if pls_nll <= svgp_nll else "svgp"
        rows.append(
            f"| {curve} | {pls_nll:.4f} | {svgp_nll:.4f} | {pls_acc:.3f} | "
            f"{svgp_acc:.3f} | {winner} |"
        )
    if not rows:
        return ""
    wins = sum("**pls**" in r for r in rows)
    return "\n".join(
        [
            "## Curve classification (FULL reference config, test split)\n",
            "Bernoulli labels drawn from the squashed curve (low Bayes\n"
            "accuracy by construction — both models hover near chance on\n"
            "accuracy; NLL separates them). PLS-ONB (sigmoid) vs SVGP with\n"
            f"a Bernoulli likelihood: PLS wins NLL on {wins}/{len(rows)} curves.\n",
            "| curve | pls nll | svgp nll | pls acc | svgp acc | nll winner |",
            "|---|---|---|---|---|---|",
            *rows,
            "",
        ]
    )


def poisson_section() -> str:
    """Per-curve test NLL/MSE from the round-2 FULL-config Poisson curve run
    (both PLS bases; the reference trains no SVGP for this family)."""
    rows = []
    for curve in _curve_order():
        onb_nll = _curve_metric("poisson_regression", curve, "pls-onb", "nll")
        ipb_nll = _curve_metric("poisson_regression", curve, "pls-ipb", "nll")
        onb_mse = _curve_metric("poisson_regression", curve, "pls-onb", "mse")
        ipb_mse = _curve_metric("poisson_regression", curve, "pls-ipb", "mse")
        if onb_nll is None:
            continue
        ipb_nll = float("nan") if ipb_nll is None else ipb_nll
        onb_mse = float("nan") if onb_mse is None else onb_mse
        ipb_mse = float("nan") if ipb_mse is None else ipb_mse
        rows.append(
            f"| {curve} | {onb_nll:.4f} | {ipb_nll:.4f} | {onb_mse:.4f} | "
            f"{ipb_mse:.4f} |"
        )
    if not rows:
        return ""
    return "\n".join(
        [
            "## Curve Poisson regression (FULL reference config, test split)\n",
            "Poisson counts with a square link; PLS with the Poisson cost on\n"
            "both bases (the reference protocol trains no SVGP here —\n"
            "reference `experiments/curves/poisson_regression/main.py`).\n",
            "| curve | pls-onb nll | pls-ipb nll | pls-onb mse | pls-ipb mse |",
            "|---|---|---|---|---|",
            *rows,
            "",
        ]
    )


def poisson_study_section() -> str:
    """Round-5 Poisson (square-link) HEAD-TO-HEAD quality study (VERDICT #7):
    PLS with the native Poisson cost (both bases) vs an SVGP trained with a
    Gaussian likelihood directly on the counts (the strongest baseline the
    reference stack offers for count data — its SVGP has no Poisson
    likelihood path, reference `experiments/curves/poisson_regression/main.py`
    trains no SVGP at all). Renders from the committed per-seed long CSV
    (``results/poisson_study_long.csv``, written by
    ``experiments/curves/poisson_regression/study.py``): paired-by-seed test
    NLL delta and the ORACLE rate RMSE (distance of the point rate estimate
    from the true generating rate lambda(x), which synthetic curves expose)."""
    path = os.path.join(ROOT, "results", "poisson_study_long.csv")
    if not os.path.exists(path):
        return ""
    long = pd.read_csv(path)
    long = long[long["split"] == "test"]
    lines = []
    # rollup counts the PRODUCTION recipe (pls-onb-hs) when its rows exist,
    # else the headline-stack analogue (pls-onb-m0); pls-onb is reference
    # parity with the demo protocol
    has_hs = bool((long["model"] == "pls-onb-hs").any())
    rollup_model = "pls-onb-hs" if has_hs else "pls-onb-m0"
    pls_models = ("pls-onb", "pls-onb-m0") + (
        ("pls-onb-hs",) if has_hs else ()
    ) + ("pls-ipb",)
    wins = {"nll": [0, 0], "rate_rmse": [0, 0]}  # [pls wins, svgp wins] (sig)
    for curve in sorted(long["curve"].unique()):
        cells = [f"| {curve} "]
        for metric in ("nll", "rate_rmse"):
            sel = long[(long["curve"] == curve) & (long["metric"] == metric)]
            sv = sel[sel["model"] == "svgp-gaussian"].set_index("seed")["value"]
            for model in pls_models:
                pv = sel[sel["model"] == model].set_index("seed")["value"]
                common = pv.index.intersection(sv.index)
                if len(common) == 0:
                    cells.append("| — ")
                    continue
                d = (pv.loc[common] - sv.loc[common]).astype(float)
                sig = (
                    len(d) > 1
                    and d.std() > 0
                    and abs(d.mean() / (d.std() / len(d) ** 0.5)) >= 2.0
                )
                tag = "ns"
                if sig:
                    tag = "pls sig" if d.mean() < 0 else "svgp sig"
                if model == rollup_model and sig:
                    wins[metric][0 if d.mean() < 0 else 1] += 1
                cells.append(f"| {d.mean():+.4f} ({len(d)}, {tag}) ")
        lines.append("".join(cells) + "|")
    if not lines:
        return ""
    n_seeds = long[long["metric"] == "nll"]["seed"].nunique()
    return "\n".join(
        [
            "## Poisson regression head-to-head — PLS (native Poisson cost) "
            "vs SVGP (Gaussian on counts)\n",
            "Paired-by-seed TEST deltas (pls − svgp; negative favours PLS)\n"
            f"over up to n={n_seeds} seeds with the counts redrawn per seed,\n"
            "on the reference's 10 synthetic curves. `nll` is the predictive\n"
            "NLL of the observed counts (a proper score for both models);\n"
            "`rate_rmse` is the ORACLE distance of each model's point rate\n"
            "estimate from the true generating rate lambda(x) = f(x)^2 —\n"
            "measurable only because the curves are synthetic. 2-sigma\n"
            "paired t verdicts; SVGP-Gaussian-on-counts is the strongest\n"
            "count-data baseline the reference stack offers (its protocol\n"
            "trains no SVGP for this family at all).\n",
            "| curve | "
            + " | ".join(f"{m.removeprefix('pls-')} nll d" for m in pls_models)
            + " | "
            + " | ".join(f"{m.removeprefix('pls-')} rate d" for m in pls_models)
            + " |",
            "|---" * (2 * len(pls_models) + 1) + "|",
            *lines,
            "",
            "`pls-onb` / `pls-onb-m0` / `pls-ipb` run the REFERENCE DEMO\n"
            "protocol verbatim (duration 0.1, patience 1e-3 — every chain\n"
            "stops at its first energy plateau, and the kernel is learned on\n"
            "the raw counts, putting the prior at Var(y) scale instead of the\n"
            "square-link latent's sqrt(rate) scale); their collapse is the\n"
            "reference protocol's own behaviour, kept as the parity record.\n"
            + (
                "`pls-onb-hs` is the PRODUCTION recipe (study.py HS_RECIPE):\n"
                "link-space (Anscombe sqrt) kernel learning + consistent-KKL\n"
                "nystrom scaling + Lambda-preconditioned discretisation +\n"
                "UCI-grade budget — same model family, trained the way the\n"
                "UCI headline protocols train non-Gaussian costs.\n"
                if has_hs
                else ""
            ),
            f"Rollup ({rollup_model}, significant only): NLL {wins['nll'][0]} pls / "
            f"{wins['nll'][1]} svgp; oracle rate RMSE {wins['rate_rmse'][0]} "
            f"pls / {wins['rate_rmse'][1]} svgp (of {len(lines)} curves).",
            "",
        ]
    )


def _n_results(d: str) -> int:
    # collect() unions the on-disk tree with the committed consolidated CSV
    # (results/uci_metrics_long.csv), so this count — and every headline /
    # ablation gate built on it — survives a clean clone with no outputs
    # trees. One nll row per (dataset, model, seed) == one nll_test.csv.
    long = collect(d, "test")
    if long.empty:
        return 0
    return int((long["metric"] == "nll").sum())


ABLATION_PROTOCOLS = (
    ("outputs", "reference"),
    ("outputs_precond", "+nystrom+precond"),
    ("outputs_precond_m0", "+m0 select"),
    ("outputs_precond_map", "+m0 MAP"),
    ("outputs_precond_smooth", "+smoothed cost"),
)


def ablation_section(task: str = "classification", model: str = "pls-onb") -> str:
    """Protocol ablation: mean test NLL of the PLS-ONB model per dataset as
    each round-3 ingredient lands (reference scaling/Euler -> consistent-KKL
    nystrom + preconditioned integrator -> empirical-Bayes mean constant
    (selected, then MAP) -> FITC-style residual-smoothed cost), with the
    shared SVGP baseline alongside. One table that shows WHERE the
    PLS-vs-SVGP gap closes."""
    base = os.path.join(ROOT, f"experiments/uci/{task}")
    cols: dict[str, dict[str, str]] = {}
    datasets: set[str] = set()
    svgp: dict[str, str] = {}
    for dirname, label in ABLATION_PROTOCOLS:
        outputs = os.path.join(base, dirname)
        if dirname == "outputs_precond_smooth" and _n_results(
            outputs + "_cpu"
        ) > _n_results(outputs):
            # host-CPU fallback sweep from the TPU-outage window (same config)
            outputs = outputs + "_cpu"
        long = collect(outputs, "test")
        if long.empty:
            continue
        sub = long[(long["model"] == model) & (long["metric"] == "nll")]
        if sub.empty:
            continue
        stats = sub.groupby("dataset")["value"].agg(["mean", "count"])
        col = {}
        for dataset, row in stats.iterrows():
            col[dataset] = f"{row['mean']:.4f} ({int(row['count'])})"
            datasets.add(dataset)
        cols[label] = col
        if dirname == "outputs_precond_map":
            ssub = long[(long["model"] == "svgp") & (long["metric"] == "nll")]
            for dataset, row in ssub.groupby("dataset")["value"].agg(
                ["mean", "count"]
            ).iterrows():
                svgp[dataset] = f"{row['mean']:.4f} ({int(row['count'])})"
    if len(cols) < 2:
        return ""
    labels = [l for _, l in ABLATION_PROTOCOLS if l in cols]
    lines = [
        "| dataset | " + " | ".join(labels) + " | svgp |",
        "|---" * (len(labels) + 2) + "|",
    ]
    for dataset in sorted(datasets):
        row = [cols[l].get(dataset, "—") for l in labels]
        lines.append(
            f"| {dataset} | " + " | ".join(row) + f" | {svgp.get(dataset, '—')} |"
        )
    return "\n".join(
        [
            f"## Protocol ablation — {task} test NLL (PLS-ONB), mean over seeds\n",
            "Each column adds one round-3 ingredient to the previous\n"
            "(protocol details in the head-to-head sections above); the SVGP\n"
            "column is the shared baseline from the MAP run's checkpoints.\n"
            "PROVENANCE: columns whose protocol was not rerun in round 4 were\n"
            "computed on the round-3 synthetic stand-ins, which predate the\n"
            "deterministic (sha256-pinned) generator — for SYNTHETIC datasets\n"
            "they are comparable within a column but not against round-4\n"
            "columns; REAL-dataset rows (breast_wdbc, digits_even,\n"
            "iris_binary, wine_uci, diabetes_sklearn) are unaffected (their\n"
            "CSVs are byte-identical).\n",
            *lines,
            "",
        ]
    )


LOSS_ATTRIBUTION_TOGGLES = {
    "classification": (
        ("outputs_precond_smooth", "headline (smooth+m0, J=100)"),
        ("outputs_precond_map", "smoothing off"),
        ("outputs_precond", "smoothing+m0 off"),
        ("outputs_precond_smooth_j1000", "headline, J=1000"),
        ("outputs_precond_smooth_t2", "headline, T=2 (4x chain)"),
        ("outputs_precond_smooth_eq", "headline + spread-equilibration phase"),
        ("outputs_precond_smooth_eqt2", "headline + eq AND T=2 (composed)"),
    ),
    # round-5 lever sweep on the real regression row (diabetes_sklearn):
    # the toggle dirs train the PLS models only — the SVGP section of the
    # eq/t2 configs is byte-identical to the headline config, so paired()
    # falls back to the headline protocol's svgp rows (same model, same
    # seed, same split).
    "regression": (
        ("outputs_precond_map", "headline (map, J=100)"),
        ("outputs_precond_map_t2", "headline, T=2 (4x chain)"),
        ("outputs_precond_map_eq", "headline + spread-equilibration phase"),
    ),
}


def loss_attribution_section(
    task: str = "classification", metric: str = "nll", lower_better: bool = True
) -> str:
    """Round-4 attribution of the headline protocol's significant NLL losses
    (VERDICT #4): for every dataset where the headline paired-by-seed test
    says SVGP wins significantly, rerun the protocol with one ingredient
    toggled — residual smoothing off (``config_precond_map``), smoothing+m0
    off (``config_precond``), particle count J 100->1000
    (``config_precond_smooth_j1000``) — on the SAME pinned data, reusing the
    headline sweep's cached splits / subsample GPs / SVGP checkpoints
    (``run_r4_ablation.sh``). Each cell is the paired per-seed delta
    (pls-onb − svgp) with a 2-sigma t verdict, so a loss either disappears
    under a named toggle (attribution) or survives all of them (a robust
    posterior-family gap, not a protocol artifact)."""
    head = _headline_dir(task)
    if head is None:
        return ""
    base = os.path.join(ROOT, f"experiments/uci/{task}")

    def paired(outputs: str, dataset: str):
        long = collect(outputs, "test")
        if long.empty:
            return None
        sel = long[(long["dataset"] == dataset) & (long["metric"] == metric)]
        pv = sel[sel["model"] == "pls-onb"].set_index("seed")["value"]
        sv = sel[sel["model"] == "svgp"].set_index("seed")["value"]
        if len(sv) == 0 and outputs != head:
            # PLS-only toggle dir (round-5 regression levers): the toggle
            # configs' svgp section is byte-identical to the headline's, so
            # the headline svgp rows are the same model per seed
            head_long = collect(head, "test")
            hsel = head_long[
                (head_long["dataset"] == dataset) & (head_long["metric"] == metric)
            ]
            sv = hsel[hsel["model"] == "svgp"].set_index("seed")["value"]
        common = pv.index.intersection(sv.index)
        if len(common) == 0:
            return None
        d = (pv.loc[common] - sv.loc[common]).astype(float)
        sig = False
        if len(d) > 1 and d.std() > 0:
            sig = abs(d.mean() / (d.std() / len(d) ** 0.5)) >= 2.0
        return d.mean(), (d.std() if len(d) > 1 else 0.0), len(d), sig

    def svgp_favoured(dm: float) -> bool:
        # delta = pls - svgp; for lower-better metrics (nll/mse) a POSITIVE
        # delta favours svgp, for higher-better (acc/auc/f1) a NEGATIVE one
        return dm > 0 if lower_better else dm < 0

    losses = []
    head_long = collect(head, "test")
    if head_long.empty:
        return ""
    for dataset in sorted(head_long["dataset"].unique()):
        r = paired(head, dataset)
        if r is None or not svgp_favoured(r[0]):
            continue
        # classification: only the SIGNIFICANT headline losses get the
        # attribution treatment; regression: any svgp-favouring mean delta
        # on a REAL dataset (the round-5 target is the ns diabetes row)
        if (r[3] and task == "classification") or (
            task == "regression" and dataset in REAL_DATASETS["regression"]
        ):
            losses.append(dataset)
    if not losses:
        return ""
    toggles = LOSS_ATTRIBUTION_TOGGLES[task]
    labels = [label for _, label in toggles]
    lines = [
        "| dataset | " + " | ".join(labels) + " |",
        "|---" * (len(labels) + 1) + "|",
    ]
    verdicts = []
    for dataset in losses:
        row = []
        flipped, thin, measured = [], [], 0
        for idx, (dirname, label) in enumerate(toggles):
            r = paired(os.path.join(base, dirname), dataset)
            if r is None:
                row.append("—")
                if idx > 0:
                    thin.append(label)
                continue
            dm, dsd, n, sig = r
            tag = (
                "svgp sig"
                if (sig and svgp_favoured(dm))
                else ("pls sig" if sig else "ns")
            )
            row.append(f"{dm:+.4f} +- {dsd:.4f} (n={n}, {tag})")
            if idx == 0:  # the headline column itself, not a toggle
                continue
            if n < 5:  # partial ablation data — no verdict from this column
                thin.append(label)
            elif not (sig and svgp_favoured(dm)):
                measured += 1
                flipped.append(label)
            else:
                measured += 1
        lines.append(f"| {dataset} | " + " | ".join(row) + " |")
        unmeasured_note = (
            f" (unmeasured/partial toggles: {', '.join(thin)})" if thin else ""
        )
        if flipped:
            verdicts.append(
                f"- `{dataset}`: the significant loss disappears under "
                + " and under ".join(f"**{f}**" for f in flipped)
                + " — attributed to those protocol ingredients, not to the sampler."
            )
        elif measured >= 3:
            verdicts.append(
                f"- `{dataset}`: the loss survives every measured toggle "
                f"({measured} at n>=5) — a robust gap between the particle "
                "predictive and SVGP's variational family on this dataset, "
                "not a protocol artifact." + unmeasured_note
            )
        else:
            verdicts.append(
                f"- `{dataset}`: attribution pending — toggles with fewer "
                f"than 5 seeds so far: {', '.join(thin) if thin else '(missing runs)'}."
            )
    return "\n".join(
        [
            f"## Loss attribution — headline {task} {metric} losses "
            "(paired delta pls−svgp per toggle)\n",
            "Each column reruns the full protocol with one ingredient\n"
            "toggled on the SAME pinned data, reusing the headline sweep's\n"
            "cached splits, subsample-GP kernels and SVGP checkpoints\n"
            "(`run_r4_ablation.sh`); "
            + (
                "negative deltas favour PLS"
                if lower_better
                else f"POSITIVE deltas favour PLS ({metric} is higher-better)"
            )
            + ". 2-sigma\npaired-by-seed t verdict in each cell.\n",
            *lines,
            "",
            *verdicts,
            "",
            _gap_mechanism_paragraphs(losses) if task == "classification" else "",
            _toggle_mechanism_paragraphs(losses) if task == "classification" else "",
        ]
    )


def _toggle_mechanism_paragraphs(datasets: list[str]) -> str:
    """At-scale mechanism evidence from the TOGGLE trees' probe CSVs
    (``results/gap_attribution_eq.csv`` / ``_t2.csv``, written by running
    ``analyse_gap.py --outputs_dirname outputs_precond_smooth_eq`` etc.
    against the round-5 basis-carrying checkpoints). Unlike the headline
    probe (seed 0 only — the headline trees predate the basis-carrying
    format and were wiped by the VM reset), the toggle trees were trained
    this round, so every seed probes validly from any backend: this is the
    n=10 validation of the latent-variance mechanism the round-4 verdict
    asked for. Only validated rows count."""
    out = []
    for tag, label in (
        ("eq", "spread-equilibration"),
        ("t2", "T=2 (4x chain)"),
        ("eqt2", "eq AND T=2 (composed)"),
    ):
        path = os.path.join(ROOT, "results", f"gap_attribution_{tag}.csv")
        if not os.path.exists(path):
            continue
        df = pd.read_csv(path)
        df = df[df["validated"] == True]  # noqa: E712
        for dataset in datasets:
            sel = df[df["dataset"] == dataset]
            if sel.empty:
                continue
            n = len(sel)
            lv, pv, nv = (
                sel["pls_latent_var"].mean(),
                sel["pls_proj_var"].mean(),
                sel["pls_noise_var"].mean(),
            )
            sv = sel["svgp_latent_var"].mean()
            dnll = (sel["pls_nll_extended"] - sel["pls_nll"]).mean()
            line = (
                f"- `{dataset}` under **{label}** (n={n} validated seeds): "
                f"latent var {lv:.2f} = {pv:.2f} (projection) + {nv:.2f} "
                f"(injected prior residual) vs SVGP {sv:.2f}; continuing the "
                f"selected chain moves test NLL by {dnll:+.4f} on average — "
                + (
                    "the chains are at their stationary law; the residual "
                    "spread (and any residual loss) is the posterior "
                    "family's, not under-convergence."
                    if abs(dnll) < 5e-3
                    else "the stopping rule still fires early at this "
                    "configuration (under-convergence persists)."
                )
            )
            if "pls_nll_temper" in sel.columns and sel["pls_nll_temper"].notna().any():
                ts = sel.dropna(subset=["pls_nll_temper", "svgp_nll_temper"])
                td = (ts["pls_nll_temper"] - ts["svgp_nll_temper"]).mean()
                line += (
                    f" Spread-tempered (validation-fit dispersion scaling on "
                    f"BOTH models, s_pls={ts['pls_temper_s'].mean():.2f} vs "
                    f"s_svgp={ts['svgp_temper_s'].mean():.2f}): paired delta "
                    f"{td:+.4f}"
                    + (
                        " — the tempered predictives are equivalent; the "
                        "entire residual gap is the dispersion the temper "
                        "layer removes."
                        if abs(td) < 5e-3
                        else "."
                    )
                )
            out.append(line)
    if not out:
        return ""
    return "\n".join(
        ["### Mechanism at scale (toggle-tree probes, all seeds validated)\n", *out, ""]
    )


def _gap_mechanism_paragraphs(datasets: list[str]) -> str:
    """Mechanism evidence for the significant headline losses, computed from
    the committed per-seed probe CSV (``results/gap_attribution.csv``,
    written by ``experiments/uci/classification/analyse_gap.py`` against the
    headline sweep's saved artifacts — clean-clone safe). Reports, per
    dataset: Monte-Carlo share, validation-recalibrated delta, the latent
    variance decomposition (particle projection + injected Matheron
    prior-residual noise vs the SVGP latent), and the continued-sampling
    probe (extends the chain at the protocol's selected step size).

    Only VALIDATED probe rows count: a row where the recomputed test NLL does
    not match the committed sweep value means the probe read the particle
    coordinates in a basis that is not the train-time one (the cross-backend
    eigh-rebuild hazard, results/checkpoint_basis_audit.md) — its latent-
    variance and continued-sampling numbers are artifacts. A CSV predating
    the gate (no ``validated`` column) is treated as all-unvalidated."""
    path = os.path.join(ROOT, "results", "gap_attribution.csv")
    if not os.path.exists(path):
        return ""
    df = pd.read_csv(path)
    if "validated" not in df.columns:
        df = df.iloc[0:0]
    else:
        df = df[df["validated"]]
    if df.empty:
        return (
            "### Mechanism\n\n"
            "Pending: no probe row reproduces the committed sweep NLLs for "
            "its (dataset, seed) — the probe read the particle coordinates "
            "in a basis that is not the train-time one (cross-backend "
            "basis-rebuild artifact — see "
            "`results/checkpoint_basis_audit.md`); rerun "
            "`analyse_gap.py` on the sweep's backend to regenerate "
            "validated mechanism evidence.\n"
        )
    out = [
        "### Mechanism (post-hoc probes on the headline artifacts, each row "
        "validated to reproduce the committed sweep NLL — "
        "`results/gap_attribution.md`)\n"
    ]
    for dataset in datasets:
        sub = df[df["dataset"] == dataset]
        if sub.empty:
            continue
        m = sub.mean(numeric_only=True)
        bits = [
            f"delta {m['delta']:+.4f}",
            f"MC std {m['pls_mc_std']:.4f} (predictive-noise keys — "
            "not sampling noise)",
        ]
        if "pls_nll_recal" in sub.columns:
            bits.append(
                "recalibrated delta "
                f"{m['pls_nll_recal'] - m['svgp_nll_recal']:+.4f} "
                "(validation-fit logistic map on both models)"
            )
        bits.append(
            f"latent var {m['pls_latent_var']:.2f} = "
            f"{m['pls_proj_var']:.2f} (particle projection) + "
            f"{m['pls_noise_var']:.2f} (injected prior residual) "
            f"vs SVGP {m['svgp_latent_var']:.2f}"
        )
        if "pls_nll_extended" in sub.columns:
            drop = m["pls_nll"] - m["pls_nll_extended"]
            # verdict is gap-RELATIVE, not absolute: on a small-NLL dataset
            # (e.g. breast_wdbc, NLL ~0.06) a 0.004-nat drop is most of the
            # paired gap — continuing the chain closing >=half the gap means
            # the stopping rule, not the posterior family, caused the loss
            verdict = (
                "the energy-plateau break fires before the particle "
                "spread equilibrates (under-convergence)"
                if m["delta"] > 0 and drop >= 0.5 * m["delta"]
                else "the chain is at its stationary law — the gap is the "
                "posterior family's, not under-convergence"
            )
            bits.append(
                f"continuing the chain at the selected step size: NLL "
                f"{m['pls_nll']:.4f} -> {m['pls_nll_extended']:.4f}, "
                f"projection var {m['pls_proj_var']:.2f} -> "
                f"{m['pls_proj_var_extended']:.2f} — {verdict}"
            )
        out.append(f"- `{dataset}` (n={len(sub)}): " + "; ".join(bits) + ".")
    if len(out) == 1:
        return ""
    out.append(
        "\nThe predictive path itself is verified faithful to the "
        "reference formula (joint-covariance block test, "
        "`tests/test_prediction.py`; torch fp64 trajectory parity, "
        "`tests/test_reference_parity.py`) — whatever dispersion the probes "
        "measure is the method's at this M_k, not an implementation "
        "artifact.\n"
    )
    return "\n".join(out)


def mixture_section() -> str:
    """Multimodal (mixture-likelihood) capability summary: the reference
    demonstrates this only as a GIF (reference README.md:33-36); here the
    saved particle clouds are quantified by
    ``experiments/curves/mixture_likelihood/summarise.py`` — particles per
    mode and estimated mode separation (true shift 20). A Gaussian
    variational posterior (SVGP) cannot represent this at all."""
    out = []
    for suffix, title, body in (
        ("", "Reference-protocol run (explicit Euler, 3-point step search)", ""),
        (
            "_precond",
            "Stable-protocol run (Lambda-preconditioned integrator, all 10 curves)",
            "`config_precond.yaml` — same reference hyperparameters with\n"
            "`discretisation: preconditioned`. Same 9/10 clean bimodal\n"
            "clouds; curve10's 3-point search still keeps no candidate\n"
            "(its divergence is not an integrator-stiffness artefact).\n",
        ),
        (
            "_wide",
            "Widened-grid rerun of curve10",
            "6-point step search down to 1e-5 (`config_wide.yaml`); the\n"
            "reference's 3-point grid keeps no candidate on curve10 — every\n"
            "candidate diverges. The kept run (eta 6.3e-5) converges in\n"
            "energy but settles in a mixed-assignment cloud rather than two\n"
            "clean modes (estimated separation below the true shift); a\n"
            "10x-longer horizon reaches the same early-stopped plateau.\n",
        ),
        (
            "_precond_wide",
            "Preconditioned + widened grid, curve10",
            "Composing the stable integrator with the widened grid keeps a\n"
            "candidate (eta 6.3e-5) but settles in the same mixed-assignment\n"
            "cloud (estimated separation ~7 vs true 20). Three independent\n"
            "rescue attempts agree: curve10's mixture posterior is a genuinely\n"
            "hard case of the protocol, not a discretisation failure. (The\n"
            "reference demonstrates this capability only as a single-curve\n"
            "GIF; this 10-curve quantified table is beyond-reference\n"
            "coverage.)\n",
        ),
    ):
        path = os.path.join(ROOT, "results", f"mixture_summary{suffix}.md")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            table = f.read().strip()
        out += [f"### {title}\n"] + ([body] if body else []) + [table, ""]
    if not out:
        return ""
    return "\n".join(
        [
            "## Multimodal regression (mixture likelihood, FULL reference config)\n",
            "Unknown-constant-shift data (Bernoulli presence p=0.5, shift 20):\n"
            "the posterior over functions is bimodal, and a particle sampler\n"
            "must keep both modes populated — a structural capability a\n"
            "Gaussian variational family (SVGP) lacks. Split and separation\n"
            "computed from the saved particles by\n"
            "`experiments/curves/mixture_likelihood/summarise.py`.\n",
        ]
        + out
    )


def _headline_dir(task: str) -> str | None:
    """The headline outputs dir for a UCI task, in decreasing preference:
    the residual-smoothed-cost run (outputs_precond_smooth, classification
    only), then the mean-constant-MAP run (outputs_precond_map), then the
    plain preconditioned run — each gated on being at least as complete as
    the next-best candidate."""
    n_results = _n_results
    base = os.path.join(ROOT, f"experiments/uci/{task}")
    precond = os.path.join(base, "outputs_precond")
    mapdir = os.path.join(base, "outputs_precond_map")
    smooth = os.path.join(base, "outputs_precond_smooth")
    # Host-CPU fallback sweep (same config/protocol, fp32) run during the
    # round-3 TPU-tunnel outage — preferred over the non-smoothed protocols
    # but below the on-chip smooth run when that one is as complete.
    smooth_cpu = os.path.join(base, "outputs_precond_smooth_cpu")
    counts = {d: n_results(d) for d in (smooth, smooth_cpu, mapdir, precond)}
    best = max(counts.values())
    if best == 0:
        return None
    # Most-preferred candidate that is essentially as complete as every
    # less-preferred one. "Essentially": >=95% of the maximal result count —
    # a strict-equality gate would flip the headline away from the preferred
    # protocol over a couple of deferred seeds (e.g. wine_uci 5/9 waiting on
    # the TPU tunnel) even though 236/240 results is a complete sweep for
    # every headline purpose; any remaining per-dataset seed gap is
    # documented in the section caption via the per-cell seed counts.
    for d in (smooth, smooth_cpu, mapdir, precond):
        if counts[d] >= 0.95 * best:
            return d
    return None


def headline_vs_svgp_section(
    task: str = "classification",
    metrics: tuple[str, ...] = ("nll", "acc", "auc", "f1"),
    lower_better: tuple[str, ...] = ("nll", "mse", "mae"),
    datasets: tuple[str, ...] | None = None,
    title_suffix: str = "",
    pls_model: str = "pls-onb",
    svgp_model: str = "svgp",
) -> str:
    """PLS vs SVGP head-to-head on the headline protocol (nystrom scaling +
    preconditioned discretisation + empirical-Bayes MAP mean constant when
    the map sweep is complete), test split.

    ``datasets``: restrict to these dataset names (the real-data-only rollup
    passes the REAL_DATASETS list so credible evidence never blends with
    synthetic stand-ins in one table)."""
    base = _headline_dir(task)
    if base is None:
        return ""
    long = collect(base, "test")
    if datasets is not None and not long.empty:
        long = long[long["dataset"].isin(datasets)]
    if long.empty:
        return ""
    is_smooth = base.endswith(("_smooth", "_smooth_cpu"))
    is_map = base.endswith("_map") or is_smooth
    config_tag = "_smooth" if is_smooth else ("_map" if is_map else "")
    out = [
        f"## PLS vs SVGP head-to-head (headline {task} protocol"
        f"{title_suffix}, test split)\n",
        f"`config_precond{config_tag}.yaml`: consistent-KKL "
        "`scaling=nystrom` +\n"
        "`discretisation=preconditioned` (the round-3 stable data-term\n"
        "integrator, docs/DESIGN.md)"
        + (
            " + `mean_constant=map` (the empirical-Bayes\n"
            "prior-mean constant — the PLS analogue of the ELBO-trained\n"
            "ConstantMean the reference hands SVGP, models/mean_constant.py)"
            if is_map
            else ""
        )
        + (
            " + `cost_smoothing=residual`\n"
            "(the FITC-style residual-smoothed cost — the same expected\n"
            "log-likelihood SVGP's ELBO scores, models/costs/smoothed_bernoulli.py)"
            if is_smooth
            else ""
        )
        + ".\nLower nll/mse wins, higher acc/auc/f1 wins; seed count in parens.\n"
        + (
            "\n*(host-CPU fp32 run of the same config — the TPU tunnel was"
            " down for the tail of round 3; `wine_uci` seeds 5/9 are the"
            " exception and ran on the chip if present at n=10, fp32 both"
            " backends — PARITY.md. Replace with the on-chip sweep when"
            " `outputs_precond_smooth` completes.)*\n"
            if base.endswith("_smooth_cpu")
            else ""
        ),
    ]
    wins = {m: 0 for m in metrics}
    ties = {m: 0 for m in metrics}
    n_datasets = {m: 0 for m in metrics}
    sig = {m: {"pls": 0, "svgp": 0, "ns": 0} for m in metrics}
    for metric in metrics:
        sel = long[long["metric"] == metric]
        if sel.empty:
            continue
        rows = [
            f"### {metric}\n",
            f"| dataset | {pls_model} | {svgp_model} | paired delta (pls-svgp) | winner |",
            "|---|---|---|---|---|",
        ]
        for dataset in sorted(sel["dataset"].unique()):
            psel = sel[(sel["dataset"] == dataset) & (sel["model"] == pls_model)]
            ssel = sel[(sel["dataset"] == dataset) & (sel["model"] == svgp_model)]
            p, s = psel["value"], ssel["value"]
            if p.empty or s.empty:
                continue
            pm, sm = p.mean(), s.mean()
            better_low = metric in lower_better
            p_sd = p.std() if len(p) > 1 else 0.0
            s_sd = s.std() if len(s) > 1 else 0.0
            # Paired-by-seed comparison: the two models share every seed's
            # split/kernel/inducing points, so the honest significance test
            # is on the per-seed differences, not the pooled stds.
            pv = psel.set_index("seed")["value"]
            sv = ssel.set_index("seed")["value"]
            common = pv.index.intersection(sv.index)
            d = (pv.loc[common] - sv.loc[common]).astype(float)
            if len(d) > 1 and d.std() > 0:
                t_stat = d.mean() / (d.std() / len(d) ** 0.5)
                significant = abs(t_stat) >= 2.0
            else:
                significant = False
            delta_cell = f"{d.mean():+.4f} +- {d.std() if len(d) > 1 else 0.0:.4f}"
            # Winner label and sig counters must agree: a significant row is
            # labelled from the SAME statistic the t-test used (the paired
            # delta); pooled means only break the non-significant cases —
            # otherwise a sub-1e-4 pooled gap with consistent per-seed
            # deltas renders "tie (sig)" while crediting a side's counter.
            if significant:
                sig_side = "pls" if (d.mean() < 0) == better_low else "svgp"
                sig[metric][sig_side] += 1
                winner = "**pls**" if sig_side == "pls" else "svgp"
                if sig_side == "pls":
                    wins[metric] += 1
                winner = f"{winner} (sig)"
            else:
                sig[metric]["ns"] += 1
                if abs(pm - sm) < 1e-4:
                    winner = "tie"
                    ties[metric] += 1
                elif (pm < sm) == better_low:
                    winner = "**pls**"
                    wins[metric] += 1
                else:
                    winner = "svgp"
                winner = f"{winner} (ns)"
            rows.append(
                f"| {dataset} | {pm:.4f} +- {p_sd:.4f} ({len(p)}) "
                f"| {sm:.4f} +- {s_sd:.4f} ({len(s)}) | {delta_cell} | {winner} |"
            )
            n_datasets[metric] += 1
        out.append("\n".join(rows) + "\n")
    if any(n_datasets.values()):
        out.append(
            "Summary: PLS wins "
            + ", ".join(f"{wins[m]}/{n_datasets[m]} on {m}" for m in wins)
            + f" (+ ties: {sum(ties.values())}).\n"
        )
        out.append(
            "Paired-by-seed significance (2-sigma t on per-seed deltas; the\n"
            "models share each seed's split/kernel/inducing points): "
            + "; ".join(
                f"{m}: pls {sig[m]['pls']}, svgp {sig[m]['svgp']}, "
                f"indistinguishable {sig[m]['ns']}"
                for m in metrics
                if sum(sig[m].values())
            )
            + ".\n"
        )
    if datasets is not None or pls_model != "pls-onb":
        pass  # rollup / variant tables are compact evidence; no narration
    elif is_map:
        out.append(
            "Root cause of the former gap (round-2 verdict): the reference\n"
            "trains SVGP's ConstantMean during ELBO optimisation while the\n"
            "PLS function class could not express a constant offset at all —\n"
            "on mushrooms the SVGP latent beat even the unpenalised span(B)\n"
            "ceiling purely through that constant. `mean_constant=map` gives\n"
            "PLS the same single empirical-Bayes scalar; the Langevin\n"
            "dynamics and stationary law are otherwise unchanged.\n"
        )
    else:
        out.append(
            "Where SVGP retains a small NLL edge on the synthetic stand-ins, it\n"
            "is not discretisation bias: a step-refinement probe on `breast`\n"
            "seed 0 (candidates spanning three decades, eta 1e-3 -> 7.1e-6)\n"
            "moves PLS test NLL only 0.5201 -> 0.5138 — the sampler is\n"
            "converged and the residual gap is the posterior itself (SVGP's\n"
            "variational family with probit Gauss-Hermite marginals vs the\n"
            "particle predictive; both share kernels). On the REAL datasets the\n"
            "pattern favours PLS (see breast_wdbc rows).\n"
        )
    return "\n".join(out)


# The datasets whose CSVs are REAL measured data (sklearn-bundled UCI
# studies, fetch_datasets.py --sklearn-bundled); everything else in the UCI
# sweeps is a schema-compatible synthetic stand-in (no egress).
REAL_DATASETS = {
    "regression": ("diabetes_sklearn", "wine_alcohol", "iris_petal"),
    "classification": ("breast_wdbc", "digits_even", "iris_binary", "wine_uci"),
}


def real_data_rollup_section() -> str:
    """Head-to-head restricted to the REAL datasets only — the credible
    evidence, never blended with synthetic stand-ins (round-4 VERDICT #5)."""
    parts = []
    for task, metrics in (
        ("classification", ("nll", "acc", "auc", "f1")),
        ("regression", ("nll", "mse")),
    ):
        s = headline_vs_svgp_section(
            task, metrics, datasets=REAL_DATASETS[task], title_suffix=""
        )
        if s:
            # strip the per-task protocol preamble; the rollup has its own
            kept = [
                line
                for line in s.splitlines()
                if line.startswith(
                    ("###", "|", "Summary:", "Paired-by-seed", "models share")
                )
            ]
            parts.append(
                "\n".join(kept).replace("### ", f"### {task} — ") + "\n"
            )
    if not parts:
        return ""
    return "\n".join(
        [
            "## REAL-data-only rollup (headline protocols, test split)\n",
            "Only datasets whose CSVs are real measured data (sklearn-bundled\n"
            "UCI studies): regression "
            + ", ".join(f"`{d}`" for d in REAL_DATASETS["regression"])
            + ";\nclassification "
            + ", ".join(f"`{d}`" for d in REAL_DATASETS["classification"])
            + ". The\n"
            "synthetic stand-ins never enter these tables — this is the\n"
            "evidence that survives when the real UCI CSVs replace the\n"
            "stand-ins (`fetch_datasets.py` + checksums.json pins).\n"
            "The canonical pair (pls-onb vs svgp) is shown; on the\n"
            "heavy-tailed pair from the same sweep (pls-student-onb vs\n"
            "svgp-student, Student-T head-to-head section above),\n"
            "`diabetes_sklearn` favours PLS on nll (ns) and significantly\n"
            "on mse.\n",
            *parts,
            "",
        ]
    )


def scaling_curve_section() -> str:
    """Measured multi-device scaling-overhead curve (bench_scaling.py):
    both parallel paths EXECUTED on the 8-way virtual CPU mesh and timed."""
    path = os.path.join(ROOT, "results", "scaling_curve.json")
    if not os.path.exists(path):
        return ""
    import json

    with open(path) as f:
        data = json.load(f)
    prov = data.get("provenance", {})
    shape = prov.get("shape", {})
    out = [
        "## Multi-device scaling overhead (8-way virtual CPU mesh, measured)\n",
        "`bench_scaling.py` runs (not just compiles) both parallel paths on\n"
        "an 8-way virtual CPU mesh at J="
        f"{shape.get('J')}, M={shape.get('M')}, N={shape.get('N')}. The host\n"
        "has ONE physical core, so all virtual devices time-share it:\n"
        "aggregate updates/s cannot rise with device count here — the\n"
        "committed quantity is the PARTITIONING + COLLECTIVE OVERHEAD.\n"
        "`eff(D) = agg(D)/agg(1)` lower-bounds the structural parallel\n"
        "efficiency: on real chips per-device compute shrinks ~1/D while\n"
        "this overhead stays.\n",
        "| path | mesh (data x particles) | devices | throughput | eff vs 1 dev |",
        "|---|---|---|---|---|",
    ]
    # efficiency computed per row against the path's own 1-device run (the
    # JSON's efficiency_vs_1dev dict is keyed by device count and collides
    # when several 8-device meshes exist)
    base_ups = {
        r["path"]: r["updates_per_s"]
        for r in data.get("rows", [])
        if r["devices"] == 1
    }
    for r in data.get("rows", []):
        b = base_ups.get(r["path"])
        e_cell = f"{r['updates_per_s'] / b:.2f}" if b else "—"
        out.append(
            f"| {r['path']} | {r['mesh']} | {r['devices']} "
            f"| {r['updates_per_s']:.0f} {r.get('unit', 'updates')}/s | {e_cell} |"
        )
    out.append(
        "\nParticle-axis sharding (the psum-free direction) costs ~nothing\n"
        "(eff ~1.0); the all-data 8x1 mesh pays the one-psum-per-step data\n"
        "drift (eff ~0.33 on this host) — the designed layout tradeoff\n"
        "(parallel/sharded.py module docstring). The GSPMD spectral tier has\n"
        "zero per-step collectives on the particle axis.\n"
    )
    return "\n".join(out)


def multichip_section() -> str:
    """Evidence table for the multi-chip harness lane: the config_parallel
    energy_cooling run (`pls.parallel: {data: 2, particles: 4}` routed
    through parallel/auto.py's GSPMD trainer on an 8-way virtual CPU mesh,
    experiments/uci/regression/run_r3_parallel.log)."""
    base = os.path.join(
        ROOT, "experiments/uci/regression/outputs_parallel/0/results"
    )
    if not os.path.isdir(base):
        return ""
    out = [
        "## Multi-chip harness run (8-way mesh, full reference protocol)\n",
        "`config_parallel.yaml` — the reference regression protocol on\n"
        "energy_cooling with `pls.parallel: {data: 2, particles: 4}`: the\n"
        "harness routes `train_pls_runner` through `parallel_train_pls`\n"
        "(parallel/auto.py, GSPMD over the unchanged scan) on a 2x4 virtual\n"
        "CPU device mesh. Sharded training is exactly the single-device\n"
        "trajectory under injected noise (tests/test_parallel.py, rtol 1e-9;\n"
        "`__graft_entry__.dryrun_multichip` asserts the same parity for the\n"
        "driver). Test-split metrics from the mesh run, all 12 model\n"
        "variants (log: experiments/uci/regression/run_r3_parallel.log):\n",
    ]
    for metric in ("nll", "mse"):
        path = os.path.join(base, f"{metric}_test.csv")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            header = f.readline().strip().split(",")
            row = f.readline().strip().split(",")
        cols = [c for c in header[1:] if not c.endswith(("-temper",))]
        out.append(f"### {metric} (test, dataset={row[0]})\n")
        out.append("| model | value |")
        out.append("|---|---|")
        for name in cols:
            val = float(row[header.index(name)])
            out.append(f"| {name} | {val:.4f} |")
        out.append("")
    return "\n".join(out)


def nystrom_section() -> str:
    """Reference vs nystrom ONB scaling on the UCI protocols
    (pls-onb rows only, test split)."""
    out_all = []
    # regression-only comparison (Euler vs Euler at matched seeds): round 3's
    # preconditioned discretisation resolved the non-Gaussian stiffness, so
    # classification now runs nystrom-scaled in the HEADLINE section above;
    # this section isolates the SCALING effect alone under the reference's
    # explicit Euler, where only the Gaussian-cost spectral tier absorbs the
    # added 1/lambda stiffness (docs/DESIGN.md "ONB prior scaling").
    for task, metrics in (("regression", ("nll", "mse")),):
        ref = collect(os.path.join(ROOT, f"experiments/uci/{task}/outputs"), "test")
        nys = collect(
            os.path.join(ROOT, f"experiments/uci/{task}/outputs_nystrom"), "test"
        )
        if ref.empty or nys.empty:
            continue
        # The config_nystrom sweep predates the round-3 headline protocol and
        # its raw pls-onb metric CSVs survive for only a sliver of the grid
        # (the run crashed mid-metrics; the temper/conformalise/svgp files it
        # wrote first are intact). A one-dataset-one-seed "comparison" table
        # is worse than none — point to the complete evidence instead.
        nys_raw = nys[(nys["model"] == "pls-onb") & (nys["metric"] == metrics[0])]
        coverage = nys_raw.groupby("dataset")["seed"].nunique()
        if len(coverage[coverage >= 3]) < 2:
            out_all.append(
                f"## ONB scaling on UCI {task} (pls-onb, test split)\n\n"
                "The standalone `config_nystrom.yaml` sweep (scaling change\n"
                "alone, explicit Euler) kept too few raw pls-onb metric files\n"
                "to tabulate (it crashed mid-metrics; its temper/conformalise\n"
                "rows survive under `outputs_nystrom/`). The scaling effect is\n"
                "instead isolated by the protocol-ablation tables above\n"
                "(`reference` -> `+nystrom+precond` column) and, analytically,\n"
                "by docs/DESIGN.md 'ONB prior scaling' +\n"
                "`results/onb_scaling_comparison.md` (curve-level sweep).\n"
            )
            continue
        out = [
            f"## ONB scaling on UCI {task} (pls-onb, test split)\n",
            "Same protocol; `scaling=nystrom` + truncated-Nystrom thresholding\n"
            "(config_nystrom.yaml) vs the reference scaling, restricted to the\n"
            "seeds the nystrom run covers. Seed count in parens. Root-cause\n"
            "analysis in docs/DESIGN.md 'ONB prior scaling': the reference\n"
            "scaling's implied function-space prior underestimates k(x,x),\n"
            "over-shrinking the posterior; the nystrom scaling's prior is the\n"
            "Nystrom approximation of k and its Gaussian-cost stationary mean\n"
            "is the Titsias-optimal SVGP mean.\n",
        ]
        for metric in metrics:
            rows = [
                f"### {metric}\n",
                "| dataset | reference | nystrom |",
                "|---|---|---|",
            ]
            r = ref[(ref["model"] == "pls-onb") & (ref["metric"] == metric)]
            n = nys[(nys["model"] == "pls-onb") & (nys["metric"] == metric)]
            common_seeds = set(n["seed"].unique())
            r = r[r["seed"].isin(common_seeds)]
            for dataset in sorted(set(r["dataset"]) & set(n["dataset"])):
                rv = r[r["dataset"] == dataset]["value"]
                nv = n[n["dataset"] == dataset]["value"]
                # NaN is truthy, so `std() or 0` never fires for single-seed
                # data — guard on the count instead
                r_sd = rv.std() if len(rv) > 1 else 0.0
                n_sd = nv.std() if len(nv) > 1 else 0.0
                rows.append(
                    f"| {dataset} | {rv.mean():.4f} +- {r_sd:.4f} ({len(rv)}) "
                    f"| {nv.mean():.4f} +- {n_sd:.4f} ({len(nv)}) |"
                )
            out.append("\n".join(rows) + "\n")
        out_all.append("\n".join(out))
    return "\n".join(out_all)


def dump_metrics_long() -> None:
    """Consolidate every per-seed metric CSV under experiments/uci/*/outputs*/
    into one tidy long CSV (results/uci_metrics_long.csv). The per-seed trees
    are gitignored (models/plots dwarf the metrics); this single committed
    artifact lets every RESULTS.md table be recomputed from a clean clone."""
    import glob as _glob

    frames = []
    for task in ("classification", "regression"):
        base = os.path.join(ROOT, "experiments", "uci", task)
        for outputs in sorted(_glob.glob(os.path.join(base, "outputs*"))):
            if not os.path.isdir(outputs):
                continue
            for split in ("train", "test", "validation"):
                long = collect(outputs, split)
                if long.empty:
                    continue
                long.insert(0, "split", split)
                long.insert(0, "protocol", os.path.basename(outputs))
                long.insert(0, "task", task)
                frames.append(long)
    path = os.path.join(ROOT, "results", "uci_metrics_long.csv")
    keys = ["task", "protocol", "split", "dataset", "model", "metric", "seed"]
    # Incremental merge: fresh on-disk rows replace same-key archived rows,
    # but protocols whose (gitignored) trees are absent keep their committed
    # history — a partial rerun must never clobber the consolidated record.
    parts = list(frames)
    if os.path.exists(path):
        try:
            parts.append(pd.read_csv(path))
        except Exception:
            pass
    if not parts:
        return
    out = pd.concat(parts, ignore_index=True).drop_duplicates(
        subset=keys, keep="first"
    )
    out.sort_values(keys).to_csv(path, index=False)
    print(f"wrote {path} ({len(out)} rows)")


def main() -> None:
    headline_cls = _headline_dir("classification")
    headline_reg = _headline_dir("regression")
    sections = [
        "# RESULTS — round-4 experiment runs\n",
        "End-to-end runs of the experiment harness at the reference's LONG\n"
        "config (simulation_duration 0.5, <=1e7 Langevin steps, 5-point\n"
        "step-size search, J=100 particles), over the reference's 10-data-seed\n"
        "protocol, on the real TPU v5e chip in float32 (fp64 numerics-critical\n"
        "factorisations on host). ROUND-4 PROVENANCE: both headline sweeps\n"
        "were rerun from scratch on-chip on DETERMINISTIC sha256-pinned\n"
        "stand-in data (the round-3 generator was seeded via Python's\n"
        "randomised hash(); `fetch_datasets.py --verify` now pins every CSV)\n"
        "with the FIXED SVGP trainer (the likelihood noise is optimised, as\n"
        "in the reference — round 3 froze it, wrecking SVGP's regression\n"
        "NLL; `results/audit_svgp.md` validates the fixed trainer to ~1e-3\n"
        "nats against a faithful fp64 torch re-implementation of the\n"
        "gpytorch protocol) and the hardened MAP mean-constant fitter\n"
        "(PLS-Student cells are fresh, no stale-fitter caveat). HEADLINE\n"
        "protocol = the consistent-KKL\n"
        "`scaling=nystrom` ONB + the Lambda-preconditioned discretisation\n"
        "(same stationary posterior; docs/DESIGN.md 'ONB prior scaling')\n"
        "+ the empirical-Bayes MAP prior-mean constant (`mean_constant=map`,\n"
        "models/mean_constant.py — the PLS analogue of SVGP's ELBO-trained\n"
        "ConstantMean) + for classification the FITC-style residual-smoothed\n"
        "Bernoulli cost (`cost_smoothing=residual`,\n"
        "models/costs/smoothed_bernoulli.py — the same expected\n"
        "log-likelihood SVGP's ELBO scores); the reference-scaling\n"
        "explicit-Euler runs follow as\n"
        "parity sections. Most of the 6+8 UCI datasets are SYNTHETIC\n"
        "schema-compatible stand-ins (no network egress here; the reference\n"
        "ships no CSVs either — `fetch_datasets.py` downloads the real ones\n"
        "when egress exists). FIVE REAL datasets ship offline via\n"
        "scikit-learn: breast_wdbc, diabetes_sklearn, digits_even,\n"
        "iris_binary, wine_uci.\n",
        bench_section(),
        headline_vs_svgp_section("classification", ("nll", "acc", "auc", "f1")),
        headline_vs_svgp_section("regression", ("nll", "mse")),
        # Student-T head-to-head at the same n=10 on-chip standard (round-4
        # VERDICT #7): the heavy-tailed likelihood pair from the same sweep —
        # PLS with the StudentTCost (reference `uci/regression/main.py:228-251`)
        # vs SVGP with a Student-T variational likelihood, sharing each
        # seed's split/kernel/inducing points with the Gaussian pair above.
        headline_vs_svgp_section(
            "regression",
            ("nll", "mse"),
            pls_model="pls-student-onb",
            svgp_model="svgp-student",
            title_suffix=" — Student-T likelihood variants",
        ),
        real_data_rollup_section(),
    ]
    if headline_reg:
        # Round 4 retrained the whole headline sweep from scratch, so every
        # PLS-Student cell was fitted with the hardened (descent-direction)
        # MAP mean-constant Newton iteration — the round-3 stale-fitter
        # caveat no longer applies to any cell in the consolidated record.
        retrain_note = (
            "All cells are round-4 retrains on the deterministic pinned\n"
            "data; PLS-Student models use the hardened MAP mean-constant\n"
            "fitter throughout (the round-3 record carried pre-hardening\n"
            "cells — fully superseded)."
        )
        sections.append(
            uci_section(
                "UCI regression — HEADLINE "
                f"({os.path.basename(headline_reg)}; diabetes_sklearn REAL)",
                os.path.relpath(headline_reg, ROOT),
                ["nll", "mse", "mae"],
                "12 model variants: PLS-ONB / PLS-Student-ONB / SVGP / SVGP-Student,\n"
                "each raw + tempered + conformalised. `diabetes_sklearn` rows are\n"
                "REAL data. " + retrain_note,
            )
        )
    sections.append(
        uci_section(
            "UCI regression — parity protocol (reference scaling, explicit Euler)",
            "experiments/uci/regression/outputs",
            ["nll", "mse", "mae"],
            "12 model variants: PLS-ONB / PLS-Student-ONB / SVGP / SVGP-Student,\n"
            "each raw + tempered + conformalised. `diabetes_sklearn` rows are\n"
            "REAL data. The reference ONB scaling over-shrinks the prior\n"
            "(docs/DESIGN.md), so raw PLS NLL trails SVGP here by design of\n"
            "the parity protocol — see the headline/nystrom sections.\n"
            "PROVENANCE: round-3 archive (pre-determinism stand-ins, frozen-\n"
            "noise SVGP trainer) — superseded as evidence by the round-4\n"
            "headline sweep; kept for the protocol-shape parity record.",
        )
    )
    if headline_cls:
        sections.append(
            uci_section(
                "UCI classification — HEADLINE "
                f"({os.path.basename(headline_cls)}; "
                "breast_wdbc/digits_even/iris_binary/wine_uci REAL)",
                os.path.relpath(headline_cls, ROOT),
                ["nll", "acc", "auc", "f1"],
                "PLS-ONB (Bernoulli-sigmoid) vs SVGP, kernels learned on\n"
                "Dirichlet-transformed targets. `breast_wdbc`, `digits_even`,\n"
                "`iris_binary` and `wine_uci` rows are REAL (sklearn-bundled)\n"
                "data; the rest are synthetic stand-ins (no egress).",
            )
        )
    sections += [
        uci_section(
            "UCI classification — parity protocol (reference scaling, explicit Euler)",
            "experiments/uci/classification/outputs",
            ["nll", "acc", "auc", "f1"],
            "PLS-ONB (Bernoulli-sigmoid) vs SVGP, kernels learned on\n"
            "Dirichlet-transformed targets (the round-2 fix — see\n"
            "tests/test_dirichlet.py). `breast_wdbc`, `digits_even`,\n"
            "`iris_binary` and `wine_uci` rows are REAL (sklearn-bundled) data.\n"
            "PROVENANCE: round-3 archive (pre-determinism stand-ins) —\n"
            "superseded as evidence by the round-4 headline sweep; kept for\n"
            "the protocol-shape parity record.",
        ),
        ablation_section(),
        ablation_section("regression"),
        loss_attribution_section(),
        # the remaining significant classification loss is on ACCURACY
        # (mushrooms, paired t=-2.7 at n=10) — nll there is ns, so the acc
        # attribution table is where the round-5 eq toggle reports
        loss_attribution_section("classification", metric="acc", lower_better=False),
        loss_attribution_section("regression"),
        nystrom_section(),
        _snapshot("curves_regression", curves_section()),
        _snapshot("curves_classification", curve_classification_section()),
        _snapshot("curves_poisson", poisson_section()),
        poisson_study_section(),
        mixture_section(),
        multichip_section(),
        scaling_curve_section(),
        profiler_section(),
    ]
    sections = [s for s in sections if s]
    path = os.path.join(ROOT, "RESULTS.md")
    with open(path, "w") as f:
        f.write("\n".join(sections))
    print(f"wrote {path}")
    dump_metrics_long()


if __name__ == "__main__":
    main()
