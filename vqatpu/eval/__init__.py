from vqatpu.eval.ffoe import (
    ensemble_logits,
    evaluate,
    export_results,
    get_logits,
    make_json,
    make_json_with_logits,
)
from vqatpu.eval.mc import compute_score_mc, evaluate_mc
from vqatpu.eval.tdiuc import (
    align_predictions,
    format_report,
    load_answerkey,
    mean_per_type,
)

__all__ = [
    "align_predictions", "compute_score_mc", "ensemble_logits", "evaluate",
    "evaluate_mc",
    "export_results", "format_report", "get_logits", "load_answerkey",
    "make_json", "make_json_with_logits", "mean_per_type",
]
