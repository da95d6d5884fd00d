"""Data-day parity drill: ONE command from real artifacts to
PARITY_RESULTS.json.

The reference's operating point is KITTI tracking 0000-0013, stereo,
mode 4, with the real ORBvoc vocabulary (loaded at reference
src/System.cc:79) and — for mode 3 — real YOLOv5/ReID weights
(README.md:13). None of those artifacts exist in this environment; the
moment they do, this script is the first action:

    python scripts/parity_drill.py \
        --kitti /data/KITTI/tracking/training \
        --vocab /data/ORBvoc.bin \
        [--yolo /data/yolov5s.pt] [--reid /data/reid.npz] \
        [--sequences 0000-0013] [--mode 4] [--max-frames N] \
        --out parity_out

Steps: (1) strict-parse the vocabulary binary (layout mismatch fails
loudly, sha256 recorded for provenance); (2) convert the YOLO checkpoint
to npz if given (detect/convert.py); (3) run every sequence through the
mode-4 CLI (pointslot_tpu.run) with built-in evaluation against the
sequence's GT; (4) aggregate fps + camera ATE/RPE + object-pose/MOT
metrics into <out>/PARITY_RESULTS.json.

`--dry-run` fabricates the artifacts (on-disk KITTI-layout fixture,
synthesized DBoW2-binary vocabulary, fresh detector npz) and runs the
whole drill end-to-end, proving the plumbing before data day.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _expand_sequences(spec: str):
    """'0000-0013' or '0000,0003,0010' -> list of 4-digit names."""
    out = []
    for part in spec.split(","):
        if "-" in part.strip():
            a, b = part.split("-")
            out.extend(f"{i:04d}" for i in range(int(a), int(b) + 1))
        else:
            out.append(f"{int(part):04d}")
    return out


def _vocab_step(path: str, results: dict) -> str:
    from pointslot_tpu.vocab.bow import load_orb_vocab_binary, load_vocab

    with open(path, "rb") as f:
        sha = hashlib.sha256(f.read()).hexdigest()
    if path.endswith((".bin", ".bin.gz", ".gz")):
        voc = load_orb_vocab_binary(path, strict=True)
    else:
        voc = load_vocab(path)
    results["vocabulary"] = {
        "path": path, "sha256": sha, "n_words": int(voc.n_words),
        "kind": type(voc).__name__, "strict_parse": "ok",
    }
    print(f"[vocab] {path}: {voc.n_words} words, sha256={sha[:16]}…, "
          "strict parse OK")
    return path


def _yolo_step(path: str, out_dir: str, results: dict) -> str:
    """Convert a .pt checkpoint to the npz the runner loads; pass npz
    through untouched (validated by loading it)."""
    from pointslot_tpu.detect.yolo import Detector

    if path.endswith(".npz"):
        det = Detector(width=32, torch_pad=True)
        det.load_npz(path)
        results["yolo"] = {"path": path, "format": "npz", "status": "ok"}
        return path
    npz = os.path.join(out_dir, "yolov5_converted.npz")
    det = Detector.from_ultralytics(path)
    det.save_npz(npz)
    results["yolo"] = {"path": path, "format": "pt->npz",
                       "converted_to": npz, "status": "ok"}
    print(f"[yolo] converted {path} -> {npz}")
    return npz


def _run_sequence(kitti_root, seq, mode, vocab, out_dir, max_frames,
                  config=None):
    from pointslot_tpu import run as cli

    seq_out = os.path.join(out_dir, f"seq_{seq}")
    argv = ["--data", kitti_root, "--sequence", seq, "--mode", str(mode),
            "--out", seq_out]
    if vocab:
        argv += ["--vocab", vocab]
    if max_frames:
        argv += ["--max-frames", str(max_frames)]
    if config:
        argv += ["--config", config]
    print(f"[run] sequence {seq}: pointslot_tpu.run {' '.join(argv)}")
    rc = cli.main(argv)
    if rc != 0:
        return {"sequence": seq, "status": f"runner rc={rc}"}
    with open(os.path.join(seq_out, "stats.json")) as f:
        stats = json.load(f)
    row = {
        "sequence": seq,
        "status": "ok",
        "frames": stats.get("frames"),
        "fps": stats.get("fps"),
        "median_track_s": stats.get("median_track_s"),
        "n_keyframes": stats.get("n_keyframes"),
    }
    ev = stats.get("evaluation") or {}
    cam = ev.get("camera", {})
    if cam:
        row["ate_rmse"] = cam.get("ate", {}).get("rmse")
        row["rpe_trans_rmse"] = cam.get("rpe", {}).get("trans_rmse")
    obj = ev.get("objects", {})
    if obj:
        row["object_center_rmse"] = obj.get("center_rmse")
        row["object_coverage"] = obj.get("coverage")
    mot = ev.get("mot", {})
    if mot:
        row["mota"] = mot.get("mota")
    if "evaluation_error" in stats:
        row["evaluation_error"] = stats["evaluation_error"]
    return row


def _make_dry_fixture(root: str):
    """On-disk KITTI-tracking-layout fixture + pose GT (the
    test_kitti_fixture layout, plus pose_gt.txt for camera evaluation)."""
    import numpy as np
    from PIL import Image

    from pointslot_tpu.config import CameraConfig
    from pointslot_tpu.datasets.synthetic import (
        SyntheticRenderer, make_scene, offline_detection_rows,
    )

    n_frames = 10
    cam = CameraConfig(width=512, height=256, fx=300.0, fy=300.0,
                       cx=256.0, cy=128.0, bf=60.0)
    scene = make_scene(n_frames=n_frames, camera=cam, n_points=2500,
                       n_objects=2, seed=5, forward_speed=0.4)
    renderer = SyntheticRenderer(scene)
    rows = offline_detection_rows(scene)

    left_dir = os.path.join(root, "image_02", "0000")
    right_dir = os.path.join(root, "image_03", "0000")
    inst_dir = os.path.join(root, "instances", "0000")
    label_dir = os.path.join(root, "label_02")
    for d in (left_dir, right_dir, inst_dir, label_dir):
        os.makedirs(d, exist_ok=True)
    for i in range(n_frames):
        left, right, inst = renderer.render(i)
        name = f"{i:06d}.png"
        Image.fromarray(np.asarray(left, np.uint8)).save(
            os.path.join(left_dir, name))
        Image.fromarray(np.asarray(right, np.uint8)).save(
            os.path.join(right_dir, name))
        raw = np.where(inst > 0, 2000 + inst.astype(np.int32), 0).astype(
            np.uint16)
        Image.fromarray(raw).save(os.path.join(inst_dir, name))
    lines = []
    for r in rows:
        if r[1] < 0:
            continue
        x0, y0, w, h = r[5:9]
        lines.append(
            f"{int(r[0])} {int(r[1])} Car {r[2]:.2f} {int(r[3])} {r[4]:.6f} "
            f"{x0:.2f} {y0:.2f} {x0 + w:.2f} {y0 + h:.2f} "
            f"{r[10]:.2f} {r[11]:.2f} {r[9]:.2f} "
            f"{r[12]:.6f} {r[13] + r[10] / 2.0:.6f} {r[14]:.6f} {r[15]:.6f}"
        )
    with open(os.path.join(label_dir, "0000.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    # camera GT, KITTI odometry 12-float rows (T_wc 3x4)
    with open(os.path.join(root, "pose_gt.txt"), "w") as f:
        for T in scene.poses_world:
            f.write(" ".join(f"{x:.9e}" for x in np.asarray(T)[:3].ravel())
                    + "\n")
    with open(os.path.join(root, "calib.yaml"), "w") as f:
        f.write(
            "%YAML:1.0\n"
            f"Camera.fx: {cam.fx}\nCamera.fy: {cam.fy}\n"
            f"Camera.cx: {cam.cx}\nCamera.cy: {cam.cy}\n"
            f"Camera.width: {cam.width}\nCamera.height: {cam.height}\n"
            f"Camera.bf: {cam.bf}\nCamera.fps: 10.0\n"
            "SLOT.MODE: 4\n"
            "ORBextractor.nFeatures: 1000\n"
            "Tracking.MinInitStereoFeatures: 300\n"
        )
    return os.path.join(root, "calib.yaml")


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--kitti", help="KITTI tracking root "
                                    "(image_02/ image_03/ label_02/ ...)")
    ap.add_argument("--vocab", help="ORBvoc.bin / .txt vocabulary")
    ap.add_argument("--yolo", help="yolov5s.pt or converted .npz (mode 3)")
    ap.add_argument("--reid", help="ReID embedder .npz (mode 3)")
    ap.add_argument("--sequences", default="0000-0013")
    ap.add_argument("--mode", type=int, default=4, choices=(3, 4))
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--out", default="parity_out")
    ap.add_argument("--config", help="reference-schema YAML (else the "
                                     "runner's KITTI defaults)")
    ap.add_argument("--dry-run", action="store_true",
                    help="fabricate fixture artifacts and run end-to-end")
    args = ap.parse_args()

    from pointslot_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    os.makedirs(args.out, exist_ok=True)
    results = {"mode": args.mode, "dry_run": bool(args.dry_run)}

    if args.dry_run:
        fix_root = os.path.join(args.out, "fixture")
        os.makedirs(fix_root, exist_ok=True)
        args.config = _make_dry_fixture(fix_root)
        args.kitti = fix_root
        args.sequences = "0000"
        # synthesized DBoW2-binary vocabulary exercises the strict parser
        from pointslot_tpu.vocab.tree import TreeVocabulary

        voc_path = os.path.join(args.out, "voc_dry.bin")
        TreeVocabulary.synthesize(k=6, depth=3, seed=1).save_binary(voc_path)
        args.vocab = voc_path
        # fresh detector npz exercises the weights-loading leg
        from pointslot_tpu.detect.yolo import Detector

        yolo_path = os.path.join(args.out, "yolo_dry.npz")
        Detector().save_npz(yolo_path)
        args.yolo = yolo_path
        print(f"[dry-run] fixture at {fix_root}")

    if not args.kitti:
        ap.error("--kitti (or --dry-run) required")

    if args.vocab:
        args.vocab = _vocab_step(args.vocab, results)
    if args.yolo:
        _yolo_step(args.yolo, args.out, results)
    if args.reid:
        results["reid"] = {"path": args.reid}

    rows = []
    for seq in _expand_sequences(args.sequences):
        try:
            rows.append(_run_sequence(
                args.kitti, seq, args.mode, args.vocab, args.out,
                args.max_frames, config=args.config))
        except Exception as e:   # noqa: BLE001 - one bad sequence must
            #                      not lose the other 13 results
            rows.append({"sequence": seq,
                         "status": f"{type(e).__name__}: {e}"})
        with open(os.path.join(args.out, "PARITY_RESULTS.json"), "w") as f:
            json.dump({**results, "sequences": rows}, f, indent=1)

    ok = [r for r in rows if r.get("status") == "ok"]
    print(json.dumps({**results, "sequences": rows}, indent=1))
    print(f"\n[done] {len(ok)}/{len(rows)} sequences ok -> "
          f"{os.path.join(args.out, 'PARITY_RESULTS.json')}")
    return 0 if len(ok) == len(rows) else 1


if __name__ == "__main__":
    sys.exit(main())
