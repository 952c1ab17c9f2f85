"""Parse a jax.profiler trace directory into a per-op device-time ledger.

Usage: python scripts/parse_profile.py <trace_dir> [top_n]

Feeds the BENCH_PROFILE / ACTIVEGS_PROFILE workflow (CLAUDE.md): prints
total device time and the top ops by self time (xprof framework_op_stats,
Google-DataTable schema), so two traces can be diffed side by side.
"""

import glob
import json
import sys


def main() -> None:
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not xplanes:
        sys.exit(f"no .xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "framework_op_stats", {})
    if isinstance(data, bytes):
        import gzip

        data = (
            gzip.decompress(data).decode()
            if data[:2] == b"\x1f\x8b"
            else data.decode()
        )
    tables = json.loads(data)
    # Google-DataTable list: table 0 = by-op stats; rows = {"c": [{"v":..}]}
    table = tables[0]
    ids = [c["id"] for c in table["cols"]]
    i_dev = ids.index("host_or_device")
    i_op = ids.index("operation")
    i_occ = ids.index("occurrences")
    i_self = ids.index("total_self_time")
    rows = []
    for r in table["rows"]:
        v = [c.get("v") if isinstance(c, dict) else None for c in r["c"]]
        if v[i_dev] and "evice" in str(v[i_dev]):
            rows.append((float(v[i_self]), int(v[i_occ]), str(v[i_op])))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"total device self time: {total / 1e3:.2f} ms over {len(rows)} ops")
    for self_us, occ, name in rows[:top_n]:
        print(f"{self_us / 1e3:9.3f} ms x{occ:<6} {name[:100]}")


if __name__ == "__main__":
    main()
