"""Aggregate a jax.profiler xplane.pb into per-op device self-times.

The tensorboard_plugin_profile converter in this image can't parse
(protobuf genfile vintage + missing pywrap symbol), so read the XSpace
proto directly: the /device:TPU:0 plane's op-level lines carry one event
per executed HLO with metadata name = HLO instruction name.

Usage: python scripts/trace_top_ops.py <xplane.pb> [top_n]
(Host-side only — run under JAX_PLATFORMS=cpu; no TPU needed.)
"""

import collections
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2

CATEGORIES = [
    ("pallas-attn", re.compile(r"fused_attn|attn_half|swin_attn")),
    ("pallas-mlp", re.compile(r"ln_mlp|fused_mlp")),
    ("pallas-stem", re.compile(r"stem|im2col")),
    ("custom-call-other", re.compile(r"custom-call")),
    ("conv", re.compile(r"^%?convolution|conv_general")),
    ("matmul", re.compile(r"^%?dot|einsum")),
    ("relayout", re.compile(r"transpose|^%?copy|reshape|concatenate|slice|pad|roll|gather|dynamic-update")),
    ("reduce/elementwise", re.compile(r"reduce|add|multiply|subtract|divide|select|compare|exp|tanh|rsqrt|convert|fusion")),
]


def categorize(name: str) -> str:
    for cat, rx in CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(p for p in xs.planes if "TPU" in p.name)
    meta = plane.event_metadata
    per_op = collections.Counter()
    per_line = collections.Counter()
    for line in plane.lines:
        for ev in line.events:
            nm = meta[ev.metadata_id].name
            per_op[(line.name, nm)] += ev.duration_ps
            per_line[line.name] += ev.duration_ps
    print("== line totals (ms) ==")
    for ln, ps in per_line.most_common():
        print(f"{ln:30s} {ps / 1e9:10.3f}")
    # op-level stats from the synchronous op timeline. "Async XLA Ops"
    # carries overlapped DMA (copy-start/slice-start) wall spans that
    # double-count against compute — prefer the plain "XLA Ops" line.
    if "XLA Ops" in per_line:
        op_line = "XLA Ops"
    else:
        op_line = max(
            (ln for ln in per_line if "op" in ln.lower() or "XLA" in ln),
            key=lambda ln: per_line[ln],
            default=max(per_line, key=per_line.get),
        )
    ops = collections.Counter()
    cats = collections.Counter()
    for (ln, nm), ps in per_op.items():
        if ln != op_line:
            continue
        ops[nm] += ps
        cats[categorize(nm)] += ps
    total = sum(ops.values())
    print(f"\n== categories on line '{op_line}' (total {total / 1e9:.3f} ms) ==")
    for cat, ps in cats.most_common():
        print(f"{cat:22s} {ps / 1e9:10.3f} ms  {100 * ps / total:5.1f}%")
    print(f"\n== top {top_n} ops ==")
    for nm, ps in ops.most_common(top_n):
        print(f"{ps / 1e9:10.3f} ms  {100 * ps / total:5.1f}%  {nm[:110]}")


if __name__ == "__main__":
    main()
