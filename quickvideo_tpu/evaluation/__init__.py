"""QA evaluation harness (reference C10: lmms-eval fork hookup,
SURVEY.md section 2 — empty submodule in the reference snapshot; the README
accuracy table is the acceptance criterion)."""

from quickvideo_tpu.evaluation.qa import (
    QASample,
    extract_choice,
    format_mc_question,
    run_qa_eval,
    shard_samples,
)
