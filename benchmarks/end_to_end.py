#!/usr/bin/env python
"""Head-to-head: full workflow vs the reference implementation.

Synthesizes a realistic Vicon Nexus export (2 force plates + 8-channel
EMG at 2000 Hz, 40 markers at 100 Hz — the dynamic_trial.csv geometry
from SURVEY §6), then times the complete workflow on both stacks:

    load CSV -> envelope pipeline -> rank-4 synergies (MU, tol=1e-6)

The reference implementation is imported read-only from
``/root/reference/src`` when present.  Use ``--scale`` to shrink the
trial (the reference's per-cell parser is slow on the full file).
"""

import argparse
import datetime
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_SRC = "/root/reference/src"


def synthesize_csv(path, n_frames_slow, subframes=20, seed=0):
    """Write a Vicon-format CSV with gait-like content."""
    rng = np.random.default_rng(seed)
    n_fast = n_frames_slow * subframes

    plates = []
    for p in range(2):
        t = np.arange(n_fast) / 2000.0
        # 0.75*pi phase offset: single-support and double-support
        # stretches alternate, like the lateral-walk protocol
        fz = -400.0 * np.clip(
            np.sin(2 * np.pi * 3.0 * t + p * 0.75 * np.pi), 0, None
        )
        data = rng.standard_normal((n_fast, 9)) * 5.0
        data[:, 2] = fz
        plates.append(data)
    acts = np.stack(
        [np.abs(np.sin(2 * np.pi * f * np.arange(n_fast) / 2000.0 + ph))
         for f, ph in [(0.9, 0), (1.3, 1), (0.6, 2)]],
        axis=1,
    )
    weights = rng.random((3, 8))
    emg = (acts @ weights) * rng.standard_normal((n_fast, 8)) * 1e-3

    markers = rng.standard_normal((n_frames_slow, 40 * 3)) * 10 + 500

    with open(path, "w") as f:
        muscles = ["VL", "RF", "GMED", "TFL", "GMAXS", "GMAXI", "BF", "ST"]
        headers = []
        for p in range(1, 3):
            for kind in ("Force", "Moment", "CoP"):
                headers.append(f"Plate #{p} - {kind}")
        header_cells = [""] * 2
        for h in headers:
            header_cells += [h, "", ""]
        header_cells += ["EMG2000 - Voltage"]
        f.write("Devices\n2000\n")
        f.write(",".join(header_cells) + "\n")
        coords = ["Frame", "Sub Frame"] + ["Fx", "Fy", "Fz", "Mx", "My", "Mz",
                                           "Cx", "Cy", "Cz"] * 2 + muscles
        f.write(",".join(coords) + "\n")
        units = ["", ""] + ["N"] * 3 + ["N.mm"] * 3 + ["mm"] * 3
        units = units + units[2:] + ["V"] * 8
        f.write(",".join(units) + "\n")
        block = np.concatenate([plates[0], plates[1], emg], axis=1)
        frames = np.repeat(np.arange(1, n_frames_slow + 1), subframes)
        subs = np.tile(np.arange(subframes), n_frames_slow)
        lines = []
        for i in range(n_fast):
            row = [str(frames[i]), str(subs[i])]
            row += [f"{v:.6g}" for v in block[i]]
            lines.append(",".join(row))
        f.write("\n".join(lines) + "\n")
        f.write("," * 130 + "\n")

        f.write("Trajectories\n100\n")
        cells = [""] * 2
        for m in range(1, 41):
            cells += [f"Subj:M{m}", "", ""]
        f.write(",".join(cells) + "\n")
        f.write(",".join(["Frame", "Sub Frame"] + ["X", "Y", "Z"] * 40) + "\n")
        f.write(",".join(["", ""] + ["mm"] * 120) + "\n")
        lines = []
        for i in range(n_frames_slow):
            row = [str(i + 1), "0"] + [f"{v:.6g}" for v in markers[i]]
            lines.append(",".join(row))
        f.write("\n".join(lines) + "\n")


def run_ours(path, warm: bool = True):
    import muscle_synergies_tpu as mst

    def once():
        t0 = time.perf_counter()
        data = mst.load_vicon_file(path)
        t_load = time.perf_counter() - t0

        emg = data.emg.df
        fs = data.emg.sampling_frequency
        t0 = time.perf_counter()
        proc = mst.rms(emg, window_size=0.5, sampling_frequency=fs)
        proc = mst.time_normalize(proc, reduce_to=200)
        proc = mst.normalize(proc)
        float(np.asarray(proc.to_numpy()).sum())  # force execution
        t_pre = time.perf_counter() - t0

        t0 = time.perf_counter()
        res = mst.find_synergies(proc.abs(), 4, solver="mu",
                                 max_iter=50_000, tol=1e-6)
        vaf = float(res.vaf_values["All signals"].iloc[0])
        t_nmf = time.perf_counter() - t0
        return t_load, t_pre, t_nmf, vaf

    if warm:
        once()  # compile warm-up; jits cache across calls
    runs = [once() for _ in range(5)]
    return _median_stages(runs)


def _median_stages(runs):
    """Per-stage medians + trimmed total-time range.

    The shared 1-core box throws occasional multi-x outliers (scheduler
    preemption mid-run), so the quoted range trims one extreme on each
    side when there are enough repeats; the medians are robust anyway.
    """
    med = [float(np.median([r[i] for r in runs])) for i in range(3)]
    totals = sorted(sum(r[:3]) for r in runs)
    if len(totals) >= 5:
        totals = totals[1:-1]
    return (*med, runs[-1][3]), (totals[0], totals[-1])


def run_reference(path):
    sys.path.insert(0, REFERENCE_SRC)
    import muscle_synergies as ref  # noqa: the reference package

    if not getattr(ref, "__file__", "").startswith(REFERENCE_SRC):
        raise RuntimeError("did not import the reference implementation")

    return _median_stages([_run_reference_once(ref, path) for _ in range(5)])


def _run_reference_once(ref, path):
    t0 = time.perf_counter()
    data = ref.load_vicon_file(path)
    t_load = time.perf_counter() - t0

    emg = data.emg.df
    fs = data.emg.sampling_frequency
    t0 = time.perf_counter()
    proc = ref.rms(emg, window_size=0.5, sampling_frequency=fs)
    proc = ref.time_normalize(proc, reduce_to=200)
    proc = ref.normalize(proc)
    t_pre = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = ref.find_synergies(proc.abs(), 4, solver="mu",
                             max_iter=50_000, tol=1e-6)
    vaf = float(res.vaf_values["All signals"].iloc[0])
    t_nmf = time.perf_counter() - t0
    return t_load, t_pre, t_nmf, vaf


DATASET_RANKS = (1, 2, 3, 4)


def _dataset_config():
    from muscle_synergies_tpu.utils import PipelineConfig

    return PipelineConfig(use_rms=True, rms_window_s=0.5, reduce_to=200)


def run_dataset_ours(paths, pipelined, chunk_files=2, prefetch=2,
                     repeats=3):
    """Multi-capture rank sweep: one-grid solve vs the parse/compute
    pipeline (``analyze_dataset_pipelined``).  Returns the median
    wall time and the rank-4 mean VAF (full D2H readback included)."""
    import muscle_synergies_tpu as mst

    cfg = _dataset_config()

    def once():
        t0 = time.perf_counter()
        if pipelined:
            res = mst.analyze_dataset_pipelined(
                paths, ranks=DATASET_RANKS, config=cfg, solver="mu",
                max_iter=50_000, tol=1e-6, chunk_files=chunk_files,
                prefetch=prefetch,
            )
        else:
            caps = [mst.load_vicon_file(p) for p in paths]
            fs = caps[0].emg.sampling_frequency
            res = mst.analyze_dataset(
                [c.emg.df for c in caps], fs, ranks=DATASET_RANKS,
                config=cfg, solver="mu", max_iter=50_000, tol=1e-6,
            )
        vaf = float(np.asarray(res.vaf_overall)[-1].mean())
        return time.perf_counter() - t0, vaf

    once()  # compile warm-up
    runs = sorted(once() for _ in range(repeats))
    return runs[len(runs) // 2]


def run_dataset_reference(paths, repeats=3):
    """The reference's sequential per-capture loop (reference
    analysis.py:909-913): parse, preprocess, rank-sweep each file."""
    sys.path.insert(0, REFERENCE_SRC)
    import muscle_synergies as ref

    lo, hi = DATASET_RANKS[0], DATASET_RANKS[-1]

    def once():
        t0 = time.perf_counter()
        vafs = []
        for path in paths:
            data = ref.load_vicon_file(path)
            emg = data.emg.df
            fs = data.emg.sampling_frequency
            proc = ref.rms(emg, window_size=0.5, sampling_frequency=fs)
            proc = ref.time_normalize(proc, reduce_to=200)
            proc = ref.normalize(proc)
            res = ref.find_synergies(
                proc.abs(), lo, hi, solver="mu", max_iter=50_000,
                tol=1e-6,
            )
            vafs.append(float(res.vaf_values["All signals"].iloc[-1]))
        return time.perf_counter() - t0, float(np.mean(vafs))

    runs = sorted(once() for _ in range(repeats))
    return runs[len(runs) // 2]


def run_dataset_mode(args):
    """--dataset N: the multi-capture x rank-sweep story.

    Emits one JSON row with the one-grid (sequential-load) time, the
    pipelined time (parse/H2D of the next chunk overlapping the device
    solve of the current one), and — when the reference is available —
    its sequential per-file loop on the same captures."""
    import jax

    paths = []
    for i in range(args.dataset):
        path = f"{args.csv}.ds{args.frames}_{i}"
        if not os.path.exists(path):
            print(f"synthesizing capture {i}...", file=sys.stderr)
            synthesize_csv(path, args.frames, seed=i)
        paths.append(path)

    seq_s, seq_vaf = run_dataset_ours(paths, pipelined=False)
    print(f"ours one-grid:  {seq_s:.2f}s (rank-4 mean VAF {seq_vaf:.4f})",
          file=sys.stderr)
    pip_s, pip_vaf = run_dataset_ours(
        paths, pipelined=True, chunk_files=args.chunk_files,
        prefetch=args.prefetch,
    )
    print(f"ours pipelined: {pip_s:.2f}s (rank-4 mean VAF {pip_vaf:.4f})",
          file=sys.stderr)

    best = min(seq_s, pip_s)
    record = {
        "metric": "dataset_end_to_end",
        "files": args.dataset,
        "frames": args.frames,
        "ranks": list(DATASET_RANKS),
        "platform": jax.default_backend(),
        "ours_sequential_s": round(seq_s, 3),
        "ours_pipelined_s": round(pip_s, 3),
        "overlap_gain_pct": round(100.0 * (seq_s - pip_s) / seq_s, 1),
        "chunk_files": args.chunk_files,
        "prefetch": args.prefetch,
        "rank4_mean_vaf": round(seq_vaf, 4),
        "date": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        ),
    }
    if not args.skip_reference and os.path.isdir(REFERENCE_SRC):
        ref_s, ref_vaf = run_dataset_reference(paths)
        print(
            f"reference loop: {ref_s:.2f}s (rank-4 mean VAF {ref_vaf:.4f})",
            file=sys.stderr,
        )
        record["reference_s"] = round(ref_s, 3)
        record["reference_rank4_mean_vaf"] = round(ref_vaf, 4)
        record["value"] = round(ref_s / best, 2)
        record["unit"] = "x vs reference (load+preprocess+rank1:4 NMF)"
        record["vs_baseline"] = record["value"]
    else:
        record["value"] = record["overlap_gain_pct"]
        record["unit"] = "% overlap gain (pipelined vs one-grid)"
        record["vs_baseline"] = 1.0
    print(json.dumps(record))
    return 0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=1600,
                        help="slow-rate frames (1600 -> 32k fast samples)")
    parser.add_argument("--skip-reference", action="store_true")
    parser.add_argument("--csv", default="/tmp/mst_end_to_end.csv")
    parser.add_argument(
        "--platform", default=None,
        help="force a JAX platform (e.g. 'cpu' for a same-core "
             "comparison against the reference)",
    )
    parser.add_argument(
        "--dataset", type=int, metavar="N", default=0,
        help="multi-capture mode: N captures x rank 1:4 sweep — "
             "one-grid vs pipelined load vs the reference's "
             "sequential loop (0 = single-capture mode)",
    )
    parser.add_argument(
        "--chunk-files", type=int, default=2,
        help="captures per pipeline stage in --dataset mode",
    )
    parser.add_argument(
        "--prefetch", type=int, default=2,
        help="pipeline depth (staged chunks) in --dataset mode",
    )
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.dataset:
        return run_dataset_mode(args)

    if not os.path.exists(args.csv):
        print(f"synthesizing {args.frames}-frame trial...", file=sys.stderr)
        synthesize_csv(args.csv, args.frames)

    ours, ours_range = run_ours(args.csv)
    print(
        f"ours:      load={ours[0]:.2f}s preprocess={ours[1]:.2f}s "
        f"nmf={ours[2]:.2f}s total={sum(ours[:3]):.2f}s vaf={ours[3]:.4f}",
        file=sys.stderr,
    )

    speedup = None
    if not args.skip_reference and os.path.isdir(REFERENCE_SRC):
        ref, ref_range = run_reference(args.csv)
        print(
            f"reference: load={ref[0]:.2f}s preprocess={ref[1]:.2f}s "
            f"nmf={ref[2]:.2f}s total={sum(ref[:3]):.2f}s vaf={ref[3]:.4f}",
            file=sys.stderr,
        )
        speedup = sum(ref[:3]) / sum(ours[:3])

    record = {
        "metric": "end_to_end_workflow_speedup_vs_reference",
        "value": round(speedup, 2) if speedup else round(sum(ours[:3]), 2),
        "unit": "x (load+preprocess+rank4 NMF)" if speedup else "s (ours)",
        "vs_baseline": round(speedup, 2) if speedup else 1.0,
        "ours_s": [round(t, 3) for t in ours_range],
        "date": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        ),
    }
    if speedup:
        record["reference_s"] = [round(t, 3) for t in ref_range]
        record["speedup_range"] = [
            round(ref_range[0] / ours_range[1], 2),
            round(ref_range[1] / ours_range[0], 2),
        ]
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
