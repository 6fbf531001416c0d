"""Device-resident ABR rate-control law.

Integer-exact jnp mirror of the reference's per-frame ABR feedback
(quality2quant, dsv_encoder.c:70-168; statistics update,
dsv_encoder.c:816-848) — the same law models/encoder.py runs on the host
(quality2quant_abr / rc_stats_update_abr). With the packed picture size
available on device (ops/piclen.py), the whole feedback loop runs inside
the encode scan: rate control with zero per-frame host round trips, and
byte-identical streams.

State layout (int32[8]), mirroring DSV_ENCODER's rate-control scalars
(dsv_encoder.h:83-99):
  0 rc_quant   1 bpf_total   2 bpf_reset        3 bpf_avg
  4 total_P_frame_q  5 avg_P_frame_q  6 last_P_frame_over  7 back_into_range

Arithmetic note: intermediates are int32 like the reference's C ints;
the `(bpf_delta << 9)` products wrap identically to C at absurd operating
points (>4 MB/frame deviations) where the reference itself would overflow.
"""

import jax.numpy as jnp

from ..constants import BPF_RESET, MAX_QUALITY, quality_percent

N_STATE = 8


def init_state(quality: int):
    """dsv_enc_start rate-control init (dsv_encoder.c:724-734)."""
    import numpy as np
    q = max(0, min(int(quality), MAX_QUALITY))
    st = np.zeros(N_STATE, np.int32)
    st[0] = q
    st[5] = q * 4 // 5
    return st


def make_abr_law(cfg, meta):
    """Returns (quality_fn, stats_fn) closures over the static config.

    quality_fn(state, is_p, forced_intra) -> (quality, state')
    stats_fn(state, is_p, used_quality, pic_len) -> state'
    is_p / forced_intra are traced booleans (the has_ref verdict and the
    forced-intra promotion are data-dependent in the GOP scan).
    """
    fps = (meta.fps_num << 5) // meta.fps_den or 1
    needed_bpf = ((cfg.bitrate << 5) // fps) >> 3
    step_cap = max(1, min(cfg.max_q_step, MAX_QUALITY))
    qp = quality_percent
    min_q, max_q = cfg.min_quality, cfg.max_quality
    min_iq = cfg.min_I_frame_quality
    nudge = bool(cfg.rc_high_motion_nudge)

    def quality_fn(st, is_p, forced_intra):
        is_p = jnp.asarray(is_p)
        q = st[0]
        bpf = jnp.where(st[3] == 0, needed_bpf, st[3])
        dir_ = jnp.where(bpf - needed_bpf > 0, -1, 1)
        delta = (jnp.abs(bpf - needed_bpf) << 9) // needed_bpf
        delta = jnp.where(dir_ == 1, delta * 2, delta)
        if nudge:
            n_p_over = is_p & (st[6] != 0)
            n_p_back = is_p & (st[6] == 0) & (st[7] != 0)
            n_i_back = (~is_p) & (st[7] != 0)
            nudged = n_p_over | n_p_back | n_i_back
            delta = jnp.where(nudged, (delta + 1) * 2, delta)
            dir_ = jnp.where(n_p_over, -1,
                             jnp.where(n_p_back | n_i_back, 1, dir_))
        else:
            nudged = jnp.bool_(False)
        delta = (q * delta) >> 9
        delta = jnp.minimum(delta, jnp.where(nudged, step_cap * 16, step_cap))
        q = q + delta * dir_
        low_p = jnp.clip(st[5] - qp(4), min_q, max_q)
        minq = jnp.where(is_p, low_p, min_iq)
        boost = jnp.where(q < qp(60), qp(15),
                          jnp.where(q < qp(70), qp(8),
                                    jnp.where(q < qp(75), qp(3), 0)))
        q_fi = jnp.clip(q + boost, 0, max_q - qp(5))
        q = jnp.where(jnp.asarray(forced_intra), q_fi, q)
        q = jnp.clip(q, minq, max_q)
        q = jnp.clip(q, 0, MAX_QUALITY)
        return q, st.at[0].set(q)

    def stats_fn(st, is_p, used_quality, pic_len):
        is_p = jnp.asarray(is_p)
        pic_len = jnp.asarray(pic_len, jnp.int32)
        bpf_total = st[1] + pic_len
        bpf_reset = st[2] + 1
        total_p = jnp.where(is_p, st[4] + used_quality, st[4])
        avg_p = jnp.where(is_p, total_p // bpf_reset, st[5])
        went_under = pic_len < (needed_bpf * 3 // 4)
        went_over = pic_len > (needed_bpf * 7 // 8)
        back = jnp.where(is_p, ((st[6] != 0) & went_under), False)
        last_over = jnp.where(is_p, went_over, False)
        bpf_avg = bpf_total // bpf_reset
        do_reset = bpf_reset >= BPF_RESET
        bpf_total = jnp.where(do_reset, bpf_avg, bpf_total)
        total_p = jnp.where(do_reset, total_p // bpf_reset, total_p)
        bpf_reset = jnp.where(do_reset, 1, bpf_reset)
        return jnp.stack([st[0], bpf_total, bpf_reset, bpf_avg, total_p,
                          avg_p, last_over.astype(jnp.int32),
                          back.astype(jnp.int32)])

    return quality_fn, stats_fn
