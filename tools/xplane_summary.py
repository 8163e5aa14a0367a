"""Summarize a jax.profiler xplane trace: top ops by device time.

Usage: python tools/xplane_summary.py /tmp/trace1 [top_n]

Reads the newest .xplane.pb under the trace dir, aggregates XLA-op
durations on the device plane(s), and prints a per-op and per-category
breakdown. Used to attribute step time (PERF.md methodology).
"""
import collections
import glob
import os
import re
import sys


def load_xspace(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit(f'no .xplane.pb under {trace_dir}')
    xs = xplane_pb2.XSpace()
    with open(paths[-1], 'rb') as f:
        xs.ParseFromString(f.read())
    return xs


def summarize(trace_dir, top_n=40):
    xs = load_xspace(trace_dir)
    op_tot = collections.Counter()
    cat_tot = collections.Counter()
    plane_tot = {}
    for plane in xs.planes:
        name = plane.name
        if 'TPU' not in name and 'GPU' not in name and 'Device' not in name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        tot = 0
        for line in plane.lines:
            # XLA op lines carry the per-op events; step lines duplicate
            if 'Steps' in line.name:
                continue
            for ev in line.events:
                dur = ev.duration_ps / 1e9  # ms
                nm = ev_meta.get(ev.metadata_id, '?')
                op_tot[nm] += dur
                tot += dur
        plane_tot[name] = tot
    for nm, ms in op_tot.items():
        base = re.split(r'[.\d]', nm)[0] or nm
        cat_tot[base] += ms
    print('== planes ==')
    for k, v in plane_tot.items():
        print(f'  {k}: {v:.1f} ms (sum of line events; lines overlap)')
    print(f'== top {top_n} ops (ms) ==')
    for nm, ms in op_tot.most_common(top_n):
        print(f'  {ms:10.2f}  {nm}')
    print('== categories (ms) ==')
    for nm, ms in cat_tot.most_common(30):
        print(f'  {ms:10.2f}  {nm}')


if __name__ == '__main__':
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
