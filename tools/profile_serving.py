"""Profile the flagship serving step and print top self-time ops.

Captures a jax.profiler trace of the 7B int8 prefix-cached serving step
(the driver headline shape) and parses the xplane with
tensorboard_plugin_profile to rank ops by self time — the tool that
found the rotary-in-transpose 45 ms fusion (models/llm/transformer.py
rotary_embedding docstring). Usage:

    python tools/profile_serving.py [--batch 80] [--quant 8] [--steps 3]

Prints a table of {op name, category, self time, occurrences} summed
over the captured steps.
"""

import argparse
import glob
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(args) -> str:
    import jax
    from bench import build_trainer, serving_inputs

    trainer = build_trainer(args.model, args.batch, args.history_len,
                            bf16=True, quant=args.quant,
                            prefix_cache=not args.no_prefix_cache)
    # identical setup to the bench harness, so the profile measures
    # exactly the benchmarked configuration
    params, arrays, _ = serving_inputs(trainer, bf16=True)

    def run_sync():
        return float(trainer.eval_step(params, arrays).sum())

    run_sync()
    run_sync()
    logdir = args.out or tempfile.mkdtemp(prefix="medtsllm_prof_")
    jax.profiler.start_trace(logdir)
    for _ in range(args.steps):
        run_sync()
    jax.profiler.stop_trace()
    print(f"trace -> {logdir}", file=sys.stderr)
    return logdir


def report_trace_json(logdir: str, top: int) -> None:
    """Rank device ops by self time from the Chrome trace
    (plugins/profile/*/[*.]trace.json.gz) — no tensorboard_plugin_profile
    needed (its native xplane converter is binary-incompatible with the
    installed TF in this env). Self time = complete-event duration minus
    time covered by nested events on the same thread."""
    import gzip
    import json
    from collections import defaultdict

    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f)["traceEvents"]

    # device pids: process_name metadata containing "TPU"/"device"
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "args" in e
                and any(s in str(e["args"].get("name", ""))
                        for s in ("TPU", "device", "Device"))}
    lanes = defaultdict(list)  # (pid, tid) -> [(ts, dur, name)]
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids \
                and e.get("dur", 0) > 0:
            lanes[(e["pid"], e.get("tid", 0))].append(
                (e["ts"], e["dur"], e.get("name", "?")))

    self_us = defaultdict(float)
    occ = defaultdict(int)
    for lane in lanes.values():
        # longer (enclosing) events must sort before same-ts children,
        # or the stack nesting inverts and self time is misattributed
        lane.sort(key=lambda e: (e[0], -e[1]))
        # stack-based self-time: each entry is [start, end, name,
        # child_time]; a nested event's duration subtracts from its
        # parent's self time
        stack = []
        for ts, dur, name in lane:
            while stack and stack[-1][1] <= ts:
                s0, e0, n0, c0 = stack.pop()
                self_us[n0] += (e0 - s0) - c0
                if stack:
                    stack[-1][3] += e0 - s0
            stack.append([ts, ts + dur, name, 0.0])
            occ[name] += 1
        while stack:
            s0, e0, n0, c0 = stack.pop()
            self_us[n0] += (e0 - s0) - c0
            if stack:
                stack[-1][3] += e0 - s0

    scored = sorted(self_us.items(), key=lambda kv: -kv[1])
    total = sum(self_us.values())
    print(f"{'self_us':>12} {'%':>6}  {'occ':>5}  op")
    for name, t in scored[:top]:
        print(f"{t:12.0f} {100 * t / max(total, 1e-9):6.2f}  "
              f"{occ[name]:>5}  {name[:100]}")
    print(f"total device self time: {total / 1e3:.1f} ms over capture")


def report(logdir: str, top: int) -> None:
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    except Exception:
        return report_trace_json(logdir, top)

    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    try:
        csv, _ = rtd.xspace_to_tool_data([paths[-1]], "framework_op_stats", {
            "tqx": "out:csv;"})
    except Exception as e:
        print(f"xplane converter unavailable ({type(e).__name__}); "
              f"falling back to the Chrome trace", file=sys.stderr)
        return report_trace_json(logdir, top)
    import csv as csvmod
    import io
    rows = list(csvmod.DictReader(io.StringIO(csv)))
    # column names vary across plugin versions; find them defensively
    def col(row, *cands, default="?"):
        for c in cands:
            if c in row:
                return row[c]
        return default

    scored = []
    for r in rows:
        t = col(r, "Total self-time (us)", "total_self_time_us",
                "Self-time (us)", default=None)
        if t is None:
            continue
        try:
            scored.append((float(t), r))
        except ValueError:
            continue
    scored.sort(key=lambda x: -x[0])
    total = sum(t for t, _ in scored)
    print(f"{'self_us':>12} {'%':>6}  {'occ':>5}  {'category':<22} op")
    for t, r in scored[:top]:
        print(f"{t:12.0f} {100*t/total:6.2f}  "
              f"{col(r, 'Occurrences', '#Occurrences', 'occurrences'):>5}  "
              f"{col(r, 'Category', 'category'):<22} "
              f"{col(r, 'Operation', 'Op name', 'operation')[:90]}")
    print(f"total device self time: {total/1e3:.1f} ms over capture")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="meta-llama/Llama-2-7b-hf")
    ap.add_argument("--batch", type=int, default=80)
    ap.add_argument("--history-len", type=int, default=256)
    ap.add_argument("--quant", type=int, default=8, choices=(0, 4, 8))
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--no-prefix-cache", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--report-only", default=None, metavar="LOGDIR",
                    help="skip capture, parse an existing trace dir")
    args = ap.parse_args()

    if args.report_only:
        report(args.report_only, args.top)
        return
    import warnings
    warnings.filterwarnings("ignore")
    import contextlib
    import io
    with contextlib.redirect_stdout(io.StringIO()):
        logdir = capture(args)
    report(logdir, args.top)


if __name__ == "__main__":
    main()
