"""ops/rc.py: the jnp ABR law must track the host law (models/encoder.py
quality2quant_abr / rc_stats_update_abr) state-for-state over random
frame-size trajectories."""

import numpy as np
import pytest

from dsv1_tpu.models.encoder import (EncoderConfig, quality2quant_abr,
                                     rc_stats_update_abr)
from dsv1_tpu.models.metadata import Metadata
from dsv1_tpu.ops import rc as rcmod

pytestmark = pytest.mark.smoke


class _Host:
    def __init__(self, quality):
        self.rc_quant = quality
        self.bpf_total = 0
        self.bpf_reset = 0
        self.bpf_avg = 0
        self.total_P_frame_q = 0
        self.avg_P_frame_q = quality * 4 // 5
        self.last_P_frame_over = 0
        self.back_into_range = 0

    def vec(self):
        return np.array([self.rc_quant, self.bpf_total, self.bpf_reset,
                         self.bpf_avg, self.total_P_frame_q,
                         self.avg_P_frame_q, self.last_P_frame_over,
                         self.back_into_range], np.int32)


@pytest.mark.parametrize("nudge", [0, 1])
@pytest.mark.parametrize("seed", [3, 11])
def test_jnp_law_tracks_host_law(nudge, seed):
    import jax

    rng = np.random.default_rng(seed)
    meta = Metadata(352, 288, 2)
    cfg = EncoderConfig(quality=1745, bitrate=1100 * 1024,
                        rc_high_motion_nudge=bool(nudge))
    host = _Host(cfg.quality)
    qfn, sfn = rcmod.make_abr_law(cfg, meta)
    qfn, sfn = jax.jit(qfn), jax.jit(sfn)
    st = rcmod.init_state(cfg.quality)
    assert np.array_equal(st, host.vec())

    mean = ((cfg.bitrate << 5) // ((meta.fps_num << 5) // meta.fps_den)) >> 3
    for t in range(400):
        is_p = bool(rng.random() < 0.85) and t % 12 != 0
        forced = (not is_p) and t % 12 != 0
        hq = quality2quant_abr(host, cfg, meta, is_p, forced)
        # pic len: noisy around target with occasional spikes
        pic_len = int(max(64, rng.normal(mean, mean * 0.6)))
        if rng.random() < 0.05:
            pic_len *= 7
        rc_stats_update_abr(host, cfg, meta, is_p, host.rc_quant, pic_len)
        jq, st = qfn(st, is_p, forced)
        st = sfn(st, is_p, jq, pic_len)
        assert int(jq) == host.rc_quant, t
        assert np.array_equal(np.asarray(st), host.vec()), t
