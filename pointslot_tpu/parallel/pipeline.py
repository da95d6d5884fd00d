"""Cross-host pipeline-stage partitioning (PP) for the SLOT back-end.

The reference's thread topology — tracking on the caller's thread plus
LocalMapping / LoopClosing worker threads fed by mutex'd keyframe queues
(reference src/System.cc:99-141, src/LocalMapping.cc:265) — scales out to
per-HOST stages: the tracking front-end on one host, the map back-end
(local mapping + loop closing + global BA) on another, exchanging
row-level MapState deltas over a packet channel (the DCN analog of
``InsertKeyFrame``).

Both hosts hold a replica of the fixed-capacity SoA MapState. Writes are
partitioned by construction so row-level last-writer-wins merging is
conflict-free:

- the tracking host allocates keyframe rows and spawns stereo map points
  in the LOW half of the point table;
- the mapping host triangulates new points into the HIGH half
  (``MapState.pt_alloc_range``) and exclusively owns culling and BA pose /
  position updates;
- keyframe-row updates carry uid guards against slot recycling, and the
  channel is FIFO, so a stale in-flight update can never clobber a
  recycled row.

Side effects that the reference delivers through shared-memory callbacks
travel as explicit events: keyframe culls ship the trajectory re-parenting
bridge (uid, parent uid, T_bridge — the spanning-tree walk of reference
src/System.cc:380-388), loop closures ship the per-keyframe pose
corrections.

Transport here is ``multiprocessing`` pipes (one machine, two processes,
separate JAX runtimes); packets are plain npz bytes, so a real deployment
replaces the Channel with sockets over DCN without touching the protocol.
"""

from __future__ import annotations

import contextlib
import io
import multiprocessing as mp
from typing import Dict, List, Optional, Tuple

import numpy as np

_NULL_LOCK = contextlib.nullcontext()

KF_UID_GUARD = "kf_uid"


# ----------------------------------------------------------------------
def encode_arrays(arrays: Dict[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def decode_arrays(blob: bytes) -> Dict[str, np.ndarray]:
    return dict(np.load(io.BytesIO(blob), allow_pickle=False))


# ----------------------------------------------------------------------
class MapReplica:
    """Row-level diff/apply of a MapState against the last-synced shadow."""

    def __init__(self, map_state):
        from pointslot_tpu.slam.checkpoint import _MAP_FIELDS

        self.m = map_state
        self.kf_fields = [f for f in _MAP_FIELDS if f.startswith("kf_")]
        self.pt_fields = [f for f in _MAP_FIELDS if f.startswith("pt_")]
        self.shadow = {
            f: getattr(map_state, f).copy()
            for f in self.kf_fields + self.pt_fields + ["obs"]
        }

    # -- diff ----------------------------------------------------------
    def _changed_rows(self, fields) -> np.ndarray:
        changed = None
        for f in fields:
            a, b = getattr(self.m, f), self.shadow[f]
            d = a != b
            d = d.reshape(d.shape[0], -1).any(axis=1)
            changed = d if changed is None else (changed | d)
        return np.nonzero(changed)[0]

    def collect(self) -> Dict[str, np.ndarray]:
        """Delta since the last collect/apply; updates the shadow."""
        m = self.m
        out: Dict[str, np.ndarray] = {}
        kf_rows = self._changed_rows(self.kf_fields)
        out["kf_rows"] = kf_rows.astype(np.int64)
        for f in self.kf_fields:
            out[f"kf/{f}"] = getattr(m, f)[kf_rows]
            self.shadow[f][kf_rows] = getattr(m, f)[kf_rows]
        pt_rows = self._changed_rows(self.pt_fields)
        out["pt_rows"] = pt_rows.astype(np.int64)
        for f in self.pt_fields:
            out[f"pt/{f}"] = getattr(m, f)[pt_rows]
            self.shadow[f][pt_rows] = getattr(m, f)[pt_rows]
        di, dj = np.nonzero(m.obs != self.shadow["obs"])
        out["obs_i"] = di.astype(np.int64)
        out["obs_j"] = dj.astype(np.int64)
        out["obs_v"] = m.obs[di, dj]
        self.shadow["obs"][di, dj] = m.obs[di, dj]
        out["next_uid"] = np.int64(m._next_uid)
        return out

    # -- apply -----------------------------------------------------------
    def apply(self, delta: Dict[str, np.ndarray], guard_uids: bool = False):
        """Write a peer delta into the local map AND the shadow (so the
        next collect doesn't echo it back)."""
        m = self.m
        kf_rows = delta["kf_rows"]
        keep = np.ones(len(kf_rows), bool)
        if guard_uids and len(kf_rows):
            # reject updates to recycled slots: the peer's uid must match
            # ours, or the row must be a (re)activation we haven't seen
            peer_uid = delta[f"kf/{KF_UID_GUARD}"]
            local_uid = m.kf_uid[kf_rows]
            keep = (peer_uid == local_uid) | ~m.kf_valid[kf_rows]
        rows = kf_rows[keep]
        for f in self.kf_fields:
            getattr(m, f)[rows] = delta[f"kf/{f}"][keep]
            self.shadow[f][rows] = delta[f"kf/{f}"][keep]
        pt_rows = delta["pt_rows"]
        for f in self.pt_fields:
            getattr(m, f)[pt_rows] = delta[f"pt/{f}"]
            self.shadow[f][pt_rows] = delta[f"pt/{f}"]
        di, dj, dv = delta["obs_i"], delta["obs_j"], delta["obs_v"]
        m.obs[di, dj] = dv
        self.shadow["obs"][di, dj] = dv
        m._next_uid = max(m._next_uid, int(delta["next_uid"]))


# ----------------------------------------------------------------------
def _mapping_stage_main(cfg, conn):
    """Mapping-host process: local mapping + loop closing over a replica.

    The stage equivalent of the LocalMapping::Run + LoopClosing::Run
    threads (reference src/LocalMapping.cc:169, src/LoopClosing.cc:60)."""
    import dataclasses
    import os

    aff = os.environ.get("POINTSLOT_STAGE_AFFINITY")
    if aff:
        # deployment emulation on one machine: pin the mapping stage to its
        # own cores so the two "hosts" do not contend (bench_scaling.py)
        try:
            os.sched_setaffinity(0, {int(x) for x in aff.split(",")})
        except (ValueError, OSError, AttributeError):   # pragma: no cover
            pass

    if cfg.runtime.pipeline_child_platform:
        # sitecustomize may have preloaded jax already, so the env var
        # alone can be too late — flip the config knob as well (it is
        # effective until the first backend use)
        os.environ["JAX_PLATFORMS"] = cfg.runtime.pipeline_child_platform
        import jax

        jax.config.update("jax_platforms", cfg.runtime.pipeline_child_platform)

    try:
        # the stage starts mid-run: hit the persistent compile cache rather
        # than cold-compiling the mapping jits while keyframes queue up
        from pointslot_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()
    except Exception:   # pragma: no cover — cache is an optimization only
        pass

    from pointslot_tpu.slam.local_mapping import LocalMapper
    from pointslot_tpu.slam.map_state import MapState

    cfg = dataclasses.replace(
        cfg, runtime=dataclasses.replace(
            cfg.runtime, async_mapping=False, pipeline_stages=False)
    )
    m = MapState(max_kfs=cfg.runtime.map_max_kfs,
                 max_points=cfg.runtime.map_max_points)
    # the mapping host triangulates into the HIGH half of the point table;
    # the tracking host spawns stereo points in the LOW half
    m.pt_alloc_range = (m.max_points // 2, m.max_points)
    mapper = LocalMapper(cfg, m)
    loop_closer = None
    events: Dict[str, list] = {"reparent": [], "loop": []}

    if cfg.loop.enabled:
        from pointslot_tpu.slam.loop_closing import LoopCloser
        from pointslot_tpu.vocab.bow import (
            load_vocab, train_default_vocab,
        )

        vocab = (load_vocab(cfg.loop.vocab_path, as_tree=cfg.loop.vocab_as_tree)
                 if cfg.loop.vocab_path else train_default_vocab())
        loop_closer = LoopCloser(cfg, m, vocab)

        def on_loop(corrections):
            uids, olds, news = [], [], []
            for kf, (T_old, T_new) in corrections.items():
                uids.append(int(m.kf_uid[kf]))
                olds.append(np.asarray(T_old, np.float64))
                news.append(np.asarray(T_new, np.float64))
            events["loop"].append((np.asarray(uids, np.int64),
                                   np.asarray(olds), np.asarray(news)))

        loop_closer.on_loop_closed = on_loop

    def on_remove(kf: int):
        # capture the trajectory re-parenting bridge BEFORE the row clears
        # (tracker.on_keyframe_removed logic, emitted as an event)
        uid = int(m.kf_uid[kf])
        neighbors = m.covisible_keyframes(kf, min_weight=1, max_n=1)
        if len(neighbors) == 0:
            valid = m.keyframe_ids()
            valid = valid[valid != kf]
            if len(valid) == 0:
                return
            neighbors = [valid[0]]
        parent = int(neighbors[0])
        T_bridge = m.kf_pose[kf] @ np.linalg.inv(m.kf_pose[parent])
        events["reparent"].append(
            (uid, int(m.kf_uid[parent]), T_bridge.astype(np.float64))
        )
        if loop_closer is not None:
            loop_closer.db.remove(kf)

    m.on_remove_keyframe = on_remove
    replica = MapReplica(m)

    while True:
        tag, blob = conn.recv()
        if tag == "stop":
            if loop_closer is not None:
                loop_closer.wait_for_gba()
            conn.send(("stopped", b""))
            return
        if tag != "kf":
            continue
        delta = decode_arrays(blob)
        kf = int(delta["new_kf"])
        # the background-GBA merge thread takes the same lock, so its
        # write-back never interleaves with mapping work or delta capture
        lock = loop_closer.map_lock if loop_closer is not None else _NULL_LOCK
        with lock:
            replica.apply(delta)
            try:
                mapper.process_keyframe(kf)
                if loop_closer is not None:
                    loop_closer.on_keyframe(kf)
            except Exception:  # pragma: no cover — stage must not die silently
                import traceback

                traceback.print_exc()
            out = replica.collect()
        if events["reparent"]:
            out["reparent_uid"] = np.asarray(
                [e[0] for e in events["reparent"]], np.int64)
            out["reparent_parent"] = np.asarray(
                [e[1] for e in events["reparent"]], np.int64)
            out["reparent_bridge"] = np.stack(
                [e[2] for e in events["reparent"]])
            events["reparent"].clear()
        if events["loop"]:
            uids, olds, news = events["loop"][-1]   # latest correction set
            out["loop_uid"], out["loop_old"], out["loop_new"] = uids, olds, news
            events["loop"].clear()
        conn.send(("update", encode_arrays(out)))


# ----------------------------------------------------------------------
class PipelineMapping:
    """Tracking-host handle to the remote mapping stage."""

    def __init__(self, system):
        import queue
        import threading

        self.system = system
        self.replica = MapReplica(system.map)
        # spawn (not fork): the tracking process has a live JAX runtime,
        # and the mapping host must initialize its own
        ctx = mp.get_context("spawn")
        self._conn, child = ctx.Pipe()
        self._proc = ctx.Process(
            target=_mapping_stage_main, args=(system.cfg, child), daemon=True
        )
        self._proc.start()
        child.close()
        self._in_flight = 0
        self._send_failed = False
        self.packets_sent = 0
        self.bytes_sent = 0
        self.bytes_received = 0
        # dedicated sender so the tracking thread never blocks on a full
        # pipe while the mapping host is itself blocked sending an update
        self._send_q: "queue.Queue" = queue.Queue()
        self._sender = threading.Thread(target=self._send_loop, daemon=True)
        self._sender.start()

    def _send_loop(self):
        while True:
            pkt = self._send_q.get()
            if pkt is None:
                return
            tag, payload = pkt
            try:
                if not isinstance(payload, bytes):
                    # serialize off the tracking thread (collect() must
                    # run under the tracking thread's consistent map view;
                    # the npz encode need not)
                    payload = encode_arrays(payload)
                    self.bytes_sent += len(payload)
                self._conn.send((tag, payload))
            except (BrokenPipeError, OSError):   # pragma: no cover
                self._send_failed = True
                return
            except Exception:   # pragma: no cover — encode failure must
                import traceback  # not hang shutdown on the lost packet

                traceback.print_exc()
                self._send_failed = True
                return

    # -- tracking-side hooks --------------------------------------------
    def on_new_keyframe(self, kf: int):
        delta = self.replica.collect()
        delta["new_kf"] = np.int64(kf)
        self._send_q.put(("kf", delta))
        self._in_flight += 1
        self.packets_sent += 1

    def poll(self, block: bool = False):
        """Apply any pending mapping-host updates (under the map lock)."""
        sys_ = self.system
        while self._in_flight and not self._send_failed and (
            block or self._conn.poll()
        ):
            tag, blob = self._conn.recv()
            self._in_flight -= 1
            if tag != "update":
                continue
            self.bytes_received += len(blob)
            delta = decode_arrays(blob)
            with sys_.map_lock:
                self.replica.apply(delta, guard_uids=True)
                self._apply_events(delta)

    def _apply_events(self, delta):
        sys_ = self.system
        m = sys_.map
        if "reparent_uid" in delta:
            for uid, parent_uid, T_bridge in zip(
                delta["reparent_uid"], delta["reparent_parent"],
                delta["reparent_bridge"],
            ):
                slots = np.nonzero(m.kf_valid & (m.kf_uid == parent_uid))[0]
                parent_slot = int(slots[0]) if len(slots) else -1
                for e in sys_.tracker.trajectory:
                    if e.ref_uid == uid:
                        e.T_rel = e.T_rel @ T_bridge
                        e.ref_uid = int(parent_uid)
                        if parent_slot >= 0:
                            e.ref_kf = parent_slot
        if "loop_uid" in delta:
            tr = sys_.tracker
            tr.velocity = None
            if tr.last_frame is not None and tr.ref_kf >= 0:
                ref_uid = int(m.kf_uid[tr.ref_kf])
                sel = np.nonzero(delta["loop_uid"] == ref_uid)[0]
                if len(sel) and tr.last_frame.T_cw is not None:
                    T_old = delta["loop_old"][int(sel[0])]
                    T_new = delta["loop_new"][int(sel[0])]
                    rel = tr.last_frame.T_cw @ np.linalg.inv(
                        T_old.astype(np.float32))
                    tr.last_frame.T_cw = (
                        rel @ T_new.astype(np.float32)
                    ).astype(np.float32)

    # ---------------------------------------------------------------
    def shutdown(self, timeout: float = 30.0):
        self.poll(block=True)   # drain every in-flight keyframe
        self._send_q.put(("stop", b""))
        self._send_q.put(None)
        try:
            self._conn.recv()   # "stopped"
        except (EOFError, BrokenPipeError):   # pragma: no cover
            pass
        self._sender.join(timeout=5)
        self._proc.join(timeout)
        if self._proc.is_alive():   # pragma: no cover
            self._proc.terminate()

    def stats(self) -> dict:
        return {
            "pipeline_packets": self.packets_sent,
            "pipeline_bytes_sent": self.bytes_sent,
            "pipeline_bytes_received": self.bytes_received,
        }
