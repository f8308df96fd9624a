from snvc_tpu.eval.kitti_ap import build_evaluator, run_kitti_eval
