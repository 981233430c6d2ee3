"""Aggregate device-plane op durations from a JAX xplane trace.

    VLSA_TPU_BENCH_PROFILE=/tmp/vlsa-prof python bench.py
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python examples/analyze_trace.py /tmp/vlsa-prof

(The pure-python protobuf env var works around the image's
tensorboard_plugin_profile / protobuf version mismatch.)
"""
import glob
import sys
from collections import defaultdict


def main(trace_dir: str, top: int = 25):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.xplane.pb"))[-1]
    print("trace:", path)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        total = defaultdict(float)
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        n = 0
        for line in plane.lines:
            for ev in line.events:
                total[meta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e9
                n += 1
        if not n:
            continue
        tot = sum(total.values())
        print(f"\n== plane: {plane.name}  ({n} events, {tot:.2f} ms summed) ==")
        for name, ms in sorted(total.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {ms:9.3f} ms  {100 * ms / tot:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vlsa-prof",
         int(sys.argv[2]) if len(sys.argv) > 2 else 25)
