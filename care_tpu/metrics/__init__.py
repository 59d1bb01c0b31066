from care_tpu.metrics.cocoscorer import COCOScorer, score_predictions

__all__ = ["COCOScorer", "score_predictions"]
