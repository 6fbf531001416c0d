import time
import numpy as np
from tests import corpus
from dsv1_tpu.constants import RATE_CONTROL_CRF, SUBSAMP_420, quality_percent
from dsv1_tpu.models.encoder import EncoderConfig
from dsv1_tpu.models.metadata import Metadata
from dsv1_tpu.ops.frame import np_yuv_split
from dsv1_tpu.parallel import encode_stream_gops
from dsv1_tpu.utils.yuv import frame_size

w, h, subsamp, G = 352, 288, SUBSAMP_420, 12
n_frames = 288
yuv = corpus.make_clip(w, h, subsamp, n_frames, seed=11)
fsz = frame_size(w, h, subsamp)
frames = [np_yuv_split(np.frombuffer(yuv[i*fsz:(i+1)*fsz], np.uint8), subsamp, w, h) for i in range(n_frames)]
meta = Metadata(w, h, subsamp)
cfg = EncoderConfig(quality=quality_percent(85), gop=G, rc_mode=RATE_CONTROL_CRF, stable_refresh=G-1)
encode_stream_gops(frames, meta, cfg)
for _ in range(3):
    t0 = time.perf_counter(); encode_stream_gops(frames, meta, cfg); t1 = time.perf_counter()
    print(f"e2e: {n_frames/(t1-t0):.1f} fps ({(t1-t0)*1e3:.0f} ms)")
