"""README perf block must match the committed bench artifact
(VERDICT r3 next #6 / weak #5: README tables were repeatedly written
from interim session runs that matched no recorded artifact)."""

import json
import pathlib
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "experiments"))


@pytest.fixture(scope="module")
def artifact():
    p = ROOT / "bench_results.json"
    if not p.exists():
        pytest.skip("no bench_results.json recorded yet (pre-chip run)")
    return json.loads(p.read_text())


def test_readme_block_matches_artifact(artifact):
    import update_readme_perf as gen

    readme = (ROOT / "README.md").read_text()
    assert gen.BEGIN in readme and gen.END in readme, \
        "README.md lost its generated bench_results markers"
    block = gen.render(artifact)
    assert block in readme, (
        "README.md perf block is stale — regenerate with "
        "`python experiments/update_readme_perf.py`")


def test_no_orphan_utilization_claims(artifact):
    """Every attention/GEMM utilization percentage in the generated
    block traces to a row in bench_results.json by construction; this
    guard is that the generator didn't silently drop rows (an em-dash
    means the bench failed that row — it must not ship silently)."""
    import update_readme_perf as gen

    block = gen.render(artifact)
    core = [k for k in ("attn_fwd_d128_n4096", "attn_fwd_bwd_d128_n4096",
                        "gemm_bf16_4096_tflops", "decode_bf16_tok_s")
            if k not in artifact["rows"]]
    assert not core, f"bench artifact is missing core rows: {core}"
    table = block.split("| Attention")[1].split("GQA")[0]
    assert "—" not in table, \
        "attention table has unmeasured cells in the committed artifact"


def test_readme_crosscheck_block_matches_artifact():
    """The cross-check table (external-kernel comparison) is also
    machine-owned: it renders from crosscheck_results.json with
    winners bolded mechanically (VERDICT r4 missing #1 — the causal
    claim lived only in a commit message while the committed table
    said the opposite)."""
    import update_readme_perf as gen

    readme = (ROOT / "README.md").read_text()
    assert gen.XBEGIN in readme and gen.XEND in readme, \
        "README.md lost its crosscheck_results markers"
    p = ROOT / "crosscheck_results.json"
    if not p.exists():
        pytest.skip("no crosscheck_results.json recorded yet")
    block = gen.render_crosscheck(json.loads(p.read_text()))
    assert block in readme, (
        "README.md cross-check table is stale — regenerate with "
        "`python experiments/update_readme_perf.py`")
