from ic_gan_tpu.eval import fid, metrics, pipeline, prdc
from ic_gan_tpu.eval.fid import frechet_distance, inception_score
from ic_gan_tpu.eval.metrics import calc_metric, list_metrics
from ic_gan_tpu.eval.prdc import compute_prdc

__all__ = ["fid", "metrics", "pipeline", "prdc", "frechet_distance",
           "inception_score", "calc_metric", "list_metrics", "compute_prdc"]
