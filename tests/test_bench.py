"""bench.py hardening: the outage probe path and the roofline models.

VERDICT r3 item 5: an outage round must ship one structured JSON record
(error + provenance) instead of a 30-line traceback with parsed=null.
"""

import json
import os
import subprocess
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pointslot_tpu.utils import roofline  # noqa: E402


class TestProbe:
    def test_probe_returns_devices(self):
        devs = bench._probe_backend(timeout_s=5.0, devices_fn=lambda: ["d0"])
        assert devs == ["d0"]

    def test_probe_times_out_on_hang(self):
        # the real failure mode: jax.devices() HANGS (tunnel down), never
        # raises — the probe must convert that into a bounded TimeoutError
        def hang():
            time.sleep(30)

        t0 = time.perf_counter()
        with pytest.raises(TimeoutError):
            bench._probe_backend(timeout_s=0.2, devices_fn=hang)
        assert time.perf_counter() - t0 < 5.0

    def test_probe_propagates_backend_error(self):
        def boom():
            raise RuntimeError("Unable to initialize backend")

        with pytest.raises(RuntimeError, match="initialize backend"):
            bench._probe_backend(timeout_s=5.0, devices_fn=boom)

    def test_outage_record_structure(self):
        rec = bench._outage_record(TimeoutError("probe exceeded 90s"))
        line = json.loads(json.dumps(rec))  # must be JSON-serializable
        assert line["error"] == "tpu_unreachable"
        assert line["metric"] == "e2e_mode4_fps"
        assert line["value"] is None
        assert "TimeoutError" in line["detail"]
        assert line["git_sha"] and line["timestamp"]

    def test_main_exits_structured_on_outage(self, tmp_path):
        """End-to-end simulated outage: main() must print exactly one
        parseable JSON line on stdout and exit non-zero."""
        script = (
            "import sys; sys.path.insert(0, {root!r})\n"
            "import bench\n"
            "bench._probe_backend = lambda *a, **k: (_ for _ in ()).throw(\n"
            "    TimeoutError('simulated outage'))\n"
            "bench.main()\n"
        ).format(root=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        p = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True,
            timeout=120,
        )
        assert p.returncode == 2
        rec = json.loads(p.stdout.strip().splitlines()[-1])
        assert rec["error"] == "tpu_unreachable"
        assert "simulated outage" in rec["detail"]


class TestRoofline:
    def test_analyze_fractions(self):
        m = roofline.KernelModel("k", flops=1e9, bytes=1e6, engine="bf16")
        out = roofline.analyze(m, measured_ms=1.0)
        # 1 GFLOP in 1 ms = 1 TFLOP/s vs 197 peak
        assert abs(out["mfu"] - 1e12 / roofline.PEAK_BF16_FLOPS) < 1e-4
        assert 0 < out["bw_frac"] < 1
        assert out["sol_ms"] <= out["ms"]
        assert out["bound"] in ("compute", "bandwidth", "latency")

    def test_analyze_unmeasured_guard(self):
        m = roofline.KernelModel("k", flops=1e9, bytes=1e6)
        out = roofline.analyze(m, measured_ms=0.0)
        assert out["bound"] == "unmeasured"
        assert out["mfu"] is None

    def test_latency_bound_detection(self):
        # tiny work over a long time -> neither wall is binding
        m = roofline.KernelModel("k", flops=1e6, bytes=1e4, engine="f32")
        out = roofline.analyze(m, measured_ms=5.0)
        assert out["bound"] == "latency"

    def test_frontend_models_positive(self):
        from pointslot_tpu.config import CameraConfig
        from pointslot_tpu.ops.frontend import StereoFrontend

        cam = CameraConfig()
        fe = StereoFrontend(cam.height, cam.width, cam.fx, cam.bf)
        models = roofline.frontend_models(fe)
        assert set(models) == {
            "pyr_fast_select", "patch_dma", "orient_brief", "stereo_sad",
        }
        for m in models.values():
            assert m.flops > 0 and m.bytes > 0

    def test_ba_and_hamming_models(self):
        ba = roofline.ba_iteration_model(32, 4096, 8)
        # S_cross einsum dominates: 2*L*P^2*6*6*3
        assert ba.flops > 2 * 4096 * 32 * 32 * 108
        hm = roofline.hamming_model(2048, 2048)
        assert hm.flops == 2 * 2048 * 2048 * 256
        assert hm.engine == "bf16"
