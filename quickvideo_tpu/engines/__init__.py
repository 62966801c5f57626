"""Built-in model engines.

Three engines mirror the reference's three model_type plugins
(SURVEY.md section 1, L3):

  qwen25_vl              — whole-video sync decode, grouped prefill
                           (reference lvu/models/qwen25_vl.py)
  qwen25_lvu             — QuickDecode batch decode with in-decoder resize
                           (reference lvu/models/qwen25_lvu.py)
  qwen25_lvu_interleaved — overlapped decode/preprocess/prefill pipeline
                           (reference lvu/models/qwen25_lvu_interleaved.py)

In this build the first two share the sync path (both decode through the
native engine — the reference's distinction was which third-party decoder it
shelled out to), and the third streams groups through AsyncPixelGroups.
"""

from quickvideo_tpu.models import register_engine
from quickvideo_tpu.engines import qwen25 as _q


register_engine(
    "qwen25_vl", _q.init_lvu_model, _q.run_sync, _q.chat_sync
)
register_engine(
    "qwen25_lvu", _q.init_lvu_model, _q.run_sync, _q.chat_sync
)
register_engine(
    "qwen25_lvu_interleaved",
    _q.init_lvu_model,
    _q.run_interleaved,
    _q.chat_interleaved,
)
