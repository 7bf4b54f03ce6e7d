"""Unit tests for operators/graph.py PageRank: engine vs an independent
pure-Python power-iteration transcription, plus the stochastic
invariant (total rank == 1 under dangling redistribution)."""

import pytest


def _py_pagerank(edges, iters=3, damping=0.85, round_to=8):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {v: round(1.0 / n, round_to) for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(iters):
        dm = sum(pr[v] for v in nodes if v not in outdeg)
        contrib = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0.0) + pr[s] / outdeg[s]
        pr = {
            v: round(base + damping * (contrib.get(v, 0.0) + dm / n), round_to)
            for v in nodes
        }
    return pr


class TestPagerank:
    EDGES = [
        (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4),
        (4, 4),          # self-loop
        (5, 0), (5, 0),  # parallel edges (double contribution)
        (6, 7),          # 7 is dangling
    ]

    def _spark_pr(self, spark, edges, **kw):
        from librecrawl_spark.operators.graph import pagerank

        e = spark.createDataFrame(edges, schema="src long, dst long")
        return {r["node"]: r["pr"] for r in pagerank(e, **kw).collect()}

    def test_matches_python_transcription(self, spark):
        got = self._spark_pr(spark, self.EDGES, iters=3)
        want = _py_pagerank(self.EDGES, iters=3)
        assert got == want

    def test_total_rank_is_stochastic(self, spark):
        got = self._spark_pr(spark, self.EDGES, iters=4)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)

    def test_dangling_node_still_ranked(self, spark):
        got = self._spark_pr(spark, self.EDGES, iters=2)
        # node 7 has no out-edges but must hold rank (> teleport floor
        # since 6 links to it)
        assert got[7] > (1 - 0.85) / len(got)

    def test_empty_edges(self, spark):
        assert self._spark_pr(spark, [], iters=2) == {}


class TestGraphPlanUnrolled:
    """plan_audit.py's graph rows are a documented blind spot: the
    engine localCheckpoints per round, so the audited plan is an
    ExistingRDD scan and explain() never sees the per-round joins.
    These tests audit ONE un-checkpointed round (checkpoint=False) so
    the per-round join shape is asserted somewhere explain() can see:
    no CartesianProduct, and every BroadcastNestedLoopJoin is one of
    the deliberate 1-row normalizer builds (pagerank's dangling-mass
    aggregate, hits' L1 totals)."""

    EDGES = TestPagerank.EDGES

    def _plan(self, df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")

    def _counts(self, plan):
        import re
        return {
            "cartesian": len(re.findall(r"\(\d+\) CartesianProduct", plan)),
            "bnlj": len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)),
        }

    def test_pagerank_round_shape(self, spark):
        from librecrawl_spark.operators.graph import pagerank

        e = spark.createDataFrame(self.EDGES, schema="src long, dst long")
        plan = self._plan(pagerank(e, iters=1, checkpoint=False))
        c = self._counts(plan)
        assert c["cartesian"] == 0
        # exactly the 1-row dangling-mass broadcast build per round
        assert c["bnlj"] <= 1, plan

    def test_hits_round_shape(self, spark):
        from librecrawl_spark.operators.graph import hits

        e = spark.createDataFrame(self.EDGES, schema="src long, dst long")
        plan = self._plan(hits(e, iters=1, checkpoint=False))
        c = self._counts(plan)
        assert c["cartesian"] == 0
        # two 1-row L1-normalizer broadcast builds per round (hub+auth);
        # without checkpointing the authority branch is re-expanded on
        # both sides of the final h.join(a), so the normalizers appear
        # up to twice each: 4 total for one round, all 1-row builds
        assert c["bnlj"] <= 4, plan

    def test_checkpoint_toggle_same_result(self, spark):
        from librecrawl_spark.operators.graph import hits, pagerank

        e = spark.createDataFrame(self.EDGES, schema="src long, dst long")
        pr_ck = {r["node"]: r["pr"] for r in pagerank(e, iters=2).collect()}
        pr_no = {r["node"]: r["pr"]
                 for r in pagerank(e, iters=2, checkpoint=False).collect()}
        assert pr_ck == pr_no
        h_ck = {r["node"]: (r["hub"], r["authority"])
                for r in hits(e, iters=2).collect()}
        h_no = {r["node"]: (r["hub"], r["authority"])
                for r in hits(e, iters=2, checkpoint=False).collect()}
        assert h_ck == h_no
