"""Minimal XSpace (.xplane.pb) summarizer — no TF/plugin dependency.

``jax.profiler.start_trace`` writes XSpace protos; the tensorboard profile
plugin in this image can't parse them (TF version mismatch), so this tool
walks the wire format directly and prints per-op total device time.

Usage: python tools/xplane_summary.py <trace.xplane.pb> [top_n] [plane_filter]

Field numbers from tsl/profiler/protobuf/xplane.proto:
  XSpace.planes = 1
  XPlane: id=1, name=2, lines=3, event_metadata=4 (map), stat_metadata=5
  XLine:  id=1, name=2, events=4
  XEvent: metadata_id=1, offset_ps=2, duration_ps=3, stats=4
  XEventMetadata: id=1, name=2
"""

import struct
import sys
from collections import defaultdict


def _varint(buf, i):
    x = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << shift
        if not b & 0x80:
            return x, i
        shift += 7


def fields(buf):
    """Yields (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fnum, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<i", buf, i)[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, v


def parse_event_metadata(buf):
    mid, name = 0, ""
    for f, _, v in fields(buf):
        if f == 1:
            mid = v
        elif f == 2:
            name = v.decode("utf-8", "ignore")
    return mid, name


def summarize(path, top_n=30, plane_filter=""):
    data = open(path, "rb").read()
    for f, _, plane_buf in fields(data):
        if f != 1:
            continue
        name = ""
        md = {}
        line_bufs = []
        for pf, _, pv in fields(plane_buf):
            if pf == 2:
                name = pv.decode("utf-8", "ignore")
            elif pf == 3:
                line_bufs.append(pv)
            elif pf == 4:  # map entry: key=1, value=2 (XEventMetadata)
                for mf, _, mv in fields(pv):
                    if mf == 2:
                        mid, mname = parse_event_metadata(mv)
                        md[mid] = mname
        if plane_filter and plane_filter.lower() not in name.lower():
            continue
        tot = defaultdict(int)
        cnt = defaultdict(int)
        for lb in line_bufs:
            for lf, _, lv in fields(lb):
                if lf != 4:
                    continue
                mid = dur = 0
                for ef, _, ev in fields(lv):
                    if ef == 1:
                        mid = ev
                    elif ef == 3:
                        dur = ev
                tot[mid] += dur
                cnt[mid] += 1
        if not tot:
            continue
        total_ms = sum(tot.values()) / 1e9
        print(f"\nPLANE: {name}  ({sum(cnt.values())} events, "
              f"{total_ms:.2f} ms accumulated)")
        for mid, ps in sorted(tot.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {ps / 1e9:9.3f} ms x{cnt[mid]:5d}  "
                  f"{md.get(mid, f'<{mid}>')[:100]}")


if __name__ == "__main__":
    summarize(sys.argv[1],
              int(sys.argv[2]) if len(sys.argv) > 2 else 30,
              sys.argv[3] if len(sys.argv) > 3 else "")
