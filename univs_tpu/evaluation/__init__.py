from univs_tpu.evaluation.davis import db_eval_iou, db_eval_boundary, evaluate_davis_sequence
from univs_tpu.evaluation.vss import confusion_matrix, miou_from_confusion, video_consistency
from univs_tpu.evaluation.vpq import vpq_single_video
from univs_tpu.evaluation.stq import STQAccumulator
from univs_tpu.evaluation.ytvis import YTVISEval
