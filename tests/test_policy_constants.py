"""Policy-constant audit (VERDICT r07 ask #4): every tunable constant
a query function uses must reach its DuckDB oracle by NAME — f-string
interpolation from the same Python constant — never as a literal twin.

Round 6 (fixed-bit LSH ladder) and round 7 (stale ndcg/recall oracle
hashes) each shipped a scale-dependent constant that lived in only one
engine: identical at gate scale, divergent at sf1. This audit makes
that class fail at test time instead of sweep time.
"""

from __future__ import annotations

import sys
import textwrap
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.audit_policy_constants import (  # noqa: E402
    _ModuleAudit,
    audit,
    check_module,
)


def test_no_literal_twin_constants():
    violations = audit()
    assert not violations, "\n".join(violations)


_BROKEN = textwrap.dedent(
    '''
    TOP_K = 7

    def my_query(spark, sf_dir):
        return spark.table("t").limit(TOP_K)

    ORACLE = {}
    ORACLE["my_slug"] = """
    SELECT x FROM t ORDER BY x LIMIT 7
    """

    QUERIES = {"my_slug": my_query}
    '''
)

_FIXED = textwrap.dedent(
    '''
    TOP_K = 7

    def my_query(spark, sf_dir):
        return spark.table("t").limit(TOP_K)

    ORACLE = {}
    ORACLE["my_slug"] = f"""
    SELECT x FROM t ORDER BY x LIMIT {TOP_K}
    """

    QUERIES = {"my_slug": my_query}
    '''
)


def _run_on(source: str, tmp_path: Path) -> list[str]:
    f = tmp_path / "fake_mod.py"
    f.write_text(source)
    mod = _ModuleAudit(f)
    # render the oracle the way the registry would (exec the module
    # body far enough to build ORACLE) — a literal and an f-string
    # produce the SAME rendered SQL, which is exactly why the audit
    # must inspect the source, not the rendered string
    ns: dict = {}
    exec(compile(source, str(f), "exec"), ns)  # noqa: S102 - test fixture
    return check_module(mod, ns["ORACLE"], allow=set())


def test_broken_literal_twin_is_caught(tmp_path):
    violations = _run_on(_BROKEN, tmp_path)
    assert len(violations) == 1 and "TOP_K" in violations[0]


def test_interpolated_constant_passes(tmp_path):
    assert _run_on(_FIXED, tmp_path) == []
