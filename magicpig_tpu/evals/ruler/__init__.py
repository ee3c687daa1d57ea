"""RULER-equivalent synthetic long-context benchmark.

A from-scratch implementation of the evaluation pipeline the reference
vendors from NVIDIA RULER (`evaluations/RULER/`): synthetic task generation
(data/synthetic/*.py), prediction drivers (pred/call_api.py), and
string-match scoring (eval/evaluate.py). Tasks, sequence lengths, and
metrics follow the reference protocol: 13 tasks x seq {16384, 32768, 65536,
98304} x 50 samples, temperature 0, string-match scoring
(`config_models.sh:15-23`, `config_tasks.sh:32-46`,
`eval/synthetic/constants.py:25-48`).
"""

from magicpig_tpu.evals.ruler.tasks import TASK_SUITE, generate_task  # noqa: F401
from magicpig_tpu.evals.ruler.score import (  # noqa: F401
    score_predictions,
    string_match_all,
    string_match_part,
)
