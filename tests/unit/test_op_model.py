"""The bench op model must track the real kernel (VERDICT r4 weak #6).

bench.py's vpu_issue_util / vpu_mfu rest on per-RK4-step op constants;
if they drift from the kernel, the headline utilization numbers drift
silently. tools/validate_op_model.py derives both totals mechanically
from the kernel's traced jaxpr; this test pins bench.py's constants to
that derivation within 10% (abstract tracing only — runs on CPU).
"""

import os
import sys

import pytest

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


@pytest.mark.parametrize("aa", [False, True])
def test_op_model_matches_kernel_jaxpr(aa):
    for p in (_REPO_ROOT, os.path.join(_REPO_ROOT, "tools")):
        if p not in sys.path:
            sys.path.insert(0, p)
    import bench
    from validate_op_model import kernel_step_ops

    issue, arith, unknown = kernel_step_ops(aa)
    assert not unknown, f"unclassified tile-shaped primitives: {unknown}"
    model_issue = bench.OPS_PER_STEP_AA if aa else bench.OPS_PER_STEP_SLIM
    model_arith = (bench.ARITH_FLOPS_PER_STEP_AA if aa
                   else bench.ARITH_FLOPS_PER_STEP_SLIM)
    assert abs(issue - model_issue) / model_issue <= 0.10, (
        f"issue ops drifted: counted {issue}, model {model_issue} — "
        "re-run tools/validate_op_model.py and update bench.py"
    )
    assert abs(arith - model_arith) / model_arith <= 0.10, (
        f"arith ops drifted: counted {arith}, model {model_arith} — "
        "re-run tools/validate_op_model.py and update bench.py"
    )
