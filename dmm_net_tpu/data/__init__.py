"""Data layer: synthetic clips, DAVIS / YouTube-VOS readers, proposal cache,
host->device pipeline."""

from dmm_net_tpu.data.synthetic import synthetic_clip_batch, synthetic_sequence  # noqa: F401
