"""Parse a jax.profiler trace directory into a per-op device-time ledger.

Usage: python scripts/parse_profile.py <trace_dir> [top_n]

Feeds the BENCH_PROFILE / ACTIVEGS_PROFILE workflow (CLAUDE.md): prints
total device time and the top ops by self time, grouping Mosaic kernels and
fusions, so two traces can be diffed side by side.
"""

import glob
import sys


def main() -> None:
    trace_dir, top_n = sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30
    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not xplanes:
        sys.exit(f"no .xplane.pb under {trace_dir}")
    xplane = max(xplanes, key=lambda p: len(open(p, "rb").read()))
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats", {})
    import gzip
    import json

    if isinstance(data, bytes):
        data = gzip.decompress(data).decode()
    rows = json.loads(data)
    # rows: list of dicts with keys incl. 'Op name'/'Self time (us)' style —
    # print whatever schema arrives, sorted by self time
    if isinstance(rows, dict):
        rows = rows.get("data", rows)
    key_self = next(
        (k for k in rows[0] if "self" in k.lower() and "time" in k.lower()), None
    )
    key_name = next((k for k in rows[0] if "name" in k.lower()), None)
    key_occ = next((k for k in rows[0] if "occurrence" in k.lower()), None)
    rows.sort(key=lambda r: -float(r[key_self]))
    total = sum(float(r[key_self]) for r in rows)
    print(f"total self time: {total / 1e3:.2f} ms over {len(rows)} ops")
    for r in rows[:top_n]:
        occ = f" x{r[key_occ]}" if key_occ else ""
        print(f"{float(r[key_self]) / 1e3:9.3f} ms{occ:>8}  {r[key_name][:110]}")


if __name__ == "__main__":
    main()
