"""Evaluation: DAVIS J&F scorer (bit-faithful numpy), result writers."""

from dmm_net_tpu.eval.davis_jf import db_eval_iou, db_eval_boundary, evaluate_sequence  # noqa: F401
