import numpy as np, jax
from tests import corpus
from dsv1_tpu.constants import SUBSAMP_420, quality_percent
from dsv1_tpu.ops.frame import np_yuv_split
from dsv1_tpu.parallel.gop import _jit_batched, block_geometry
from dsv1_tpu.utils.yuv import frame_size

w, h, subsamp, G = 352, 288, SUBSAMP_420, 12
n_frames = 48
yuv = corpus.make_clip(w, h, subsamp, n_frames, seed=11)
fsz = frame_size(w, h, subsamp)
frames = [np_yuv_split(np.frombuffer(yuv[i*fsz:(i+1)*fsz], np.uint8), subsamp, w, h) for i in range(n_frames)]
blk_w, blk_h, nbh, nbv = block_geometry(w, h)
ngops = n_frames // G
y = np.stack([f[0] for f in frames]).reshape(ngops, G, h, w)
u = np.stack([f[1] for f in frames]).reshape(ngops, G, h//2, w//2)
v = np.stack([f[2] for f in frames]).reshape(ngops, G, h//2, w//2)
fn, unpack = _jit_batched(subsamp, w, h, G, quality_percent(85), True, 4, 50, G-1, 0, None)
stab0 = np.zeros((4, nbh*nbv, 2), np.int32)
refresh0 = np.zeros(4, np.int32)
(out_i, outs_p), _ = unpack(*jax.device_get(fn(y, u, v, np.zeros(4, np.int32), stab0, refresh0)))
for c in range(3):
    pos, vals, cnt = outs_p["qcomp_p"][c]
    print(f"P plane {c}: K={pos.shape[-1]} cnt max={int(np.max(cnt))} mean={float(np.mean(cnt)):.0f}")
    # max run among valid entries
    q8, pos_i, vals_i, nbig = out_i["qcomp_i"][c]
    print(f"I plane {c}: nbig max={int(np.max(nbig))}")
    mx_run = 0; mx_val = 0
    for g in range(pos.shape[0]):
        for t in range(pos.shape[1]):
            n_ = int(cnt[g, t]); p = pos[g, t][:n_].astype(np.int64)
            if n_ == 0: continue
            prev = np.concatenate(([-1], p[:-1]))
            mx_run = max(mx_run, int((p - prev - 1).max()))
            mx_val = max(mx_val, int(np.abs(vals[g, t][:n_]).max()))
    print(f"  max run {mx_run}, max |val| {mx_val}")
