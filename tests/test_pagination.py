"""Pagination (Q16) + corpus stats (Q17) API parity."""


def test_search_page_local(tiny_index_dir):
    from deusu_spark.query_local import LocalSearcher

    ls = LocalSearcher(tiny_index_dir)
    full = ls.search("linux", k=40)
    page1 = ls.search_page("linux", startwith=1, showcount=10)
    page2 = ls.search_page("linux", startwith=11, showcount=10)
    assert page1[:10] == full[:10]
    assert page2[:10] == full[10:20]
    # reference clamps: showcount floor 10, startwith cap 991
    assert len(ls.search_page("linux", startwith=1, showcount=1)) >= min(
        10, len(full)
    )


def test_search_page_engine(engine):
    full = engine.search("linux", k=30)
    page = engine.search_page("linux", startwith=11, showcount=10)
    assert page[:10] == full[10:20]


def test_query_info(engine, oracle_index):
    info = engine.query_info("linux -google der")
    assert info["corpussize"] == oracle_index.n_docs
    kws = {k["keyword"]: k for k in info["keywords"]}
    assert kws["linux"]["occurrences"] == oracle_index.df("linux")
    assert kws["google"]["occurrences"] == oracle_index.df("google")
    assert "der" not in kws  # stopword stripped
    assert all(k["idf"] > 0 for k in info["keywords"])
