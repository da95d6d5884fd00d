"""Micro-bench: BA ms/LM-iteration at the round-1 caps (32 poses, 4096
points, 16k edges) on the attached chip. Round-1 number: 6.1 ms/iter with
the flat-edge scatter engine; the point-major slot engine has no scatters."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from pointslot_tpu.solvers import local_ba

rng = np.random.default_rng(0)
P, L, K = 32, 4096, 8
FX, FY, CX, CY, BF = 721.5, 721.5, 609.6, 172.9, 384.4

poses = np.tile(np.eye(4, dtype=np.float32), (P, 1, 1))
for i in range(P):
    poses[i, 2, 3] = -0.6 * i
pts = rng.uniform([-15, -4, 4], [15, 4, 60], size=(L, 3)).astype(np.float32)
e_pose, e_point, e_obs, e_st = [], [], [], []
for l in range(L):
    for p in rng.choice(P, 4, replace=False):
        T = poses[p]
        pc = pts[l] @ T[:3, :3].T + T[:3, 3]
        if pc[2] < 0.5:
            continue
        u = FX * pc[0] / pc[2] + CX
        v = FY * pc[1] / pc[2] + CY
        e_pose.append(p); e_point.append(l)
        e_obs.append([u + rng.normal()*0.3, v + rng.normal()*0.3,
                      u - BF / pc[2] + rng.normal()*0.3])
        e_st.append(True)
E = len(e_pose)
print(f"E={E}")
prob, _ = local_ba.build_problem(
    poses=poses, pose_fixed=np.arange(P) == 0, points=pts + rng.normal(scale=0.05, size=pts.shape).astype(np.float32),
    e_pose=np.asarray(e_pose), e_point=np.asarray(e_point),
    e_obs=np.asarray(e_obs, np.float32), e_stereo=np.asarray(e_st),
    e_inv_sigma2=np.ones(E, np.float32), P_cap=P, L_cap=L, K=K,
)
# full 5+10 protocol
r = local_ba.bundle_adjust(prob, FX, FY, CX, CY, BF)
jax.block_until_ready(r.poses)
t0 = time.perf_counter()
N = 5
for _ in range(N):
    r = local_ba.bundle_adjust(prob, FX, FY, CX, CY, BF)
jax.block_until_ready(r.poses)
dt = (time.perf_counter() - t0) / N
print(f"full 5+10 solve: {dt*1000:.1f} ms -> {dt*1000/15:.2f} ms/LM-iter")
print("final cost:", float(r.cost))

# per-call blocking timing (tunnel async dispatch can mislead)
t0 = time.perf_counter()
for _ in range(N):
    r = local_ba.bundle_adjust(prob, FX, FY, CX, CY, BF)
    jax.block_until_ready(r.poses)
dt = (time.perf_counter() - t0) / N
print(f"blocked: full 5+10 solve: {dt*1000:.1f} ms -> {dt*1000/15:.2f} ms/LM-iter")
