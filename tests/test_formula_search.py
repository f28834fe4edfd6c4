"""Expression-level formula browsing vs a pure-python oracle."""

import pyarrow as pa
import pytest


def test_formula_search_matches_python_oracle(ray_session, tmp_path):
    from tangent_ray.config import EngineConfig
    from tangent_ray.eval.golden import query_tuple_bag, replay_score
    from tangent_ray.fixtures import generate_transcripts, write_transcripts
    from tangent_ray.index.build import list_input_files
    from tangent_ray.query.formula import formula_search
    from tangent_ray.sources.corpus import TranscriptsCorpus
    from tangent_ray.tokenize.batch import TokenizeBatch

    data_dir = str(tmp_path / "tr")
    write_transcripts(data_dir, 12, files=3)
    files = list_input_files(data_dir)

    queries = {
        "q-frac": "[V!x[=[F!,o[N!1],u[V!p]]]]",  # fixture template hit
        "q-wild": "[?v[=[F!,o[N!1],u[V!p]]]]",  # wildcard-from variant
    }
    window, eol = 2, "small"
    got = formula_search(
        queries, files, window=window, eol=eol, topk=10
    ).to_pylist()
    assert got, "fixture corpus must contain matching formulas"

    # python oracle: enumerate every expression instance serially
    corpus = TranscriptsCorpus()
    tok = TokenizeBatch(EngineConfig(window=window, eol=eol), corpus)
    import pyarrow.parquet as pq

    want: dict[str, dict[str, tuple[float, set]]] = {q: {} for q in queries}
    bags = {q: query_tuple_bag(e, window, eol) for q, e in queries.items()}
    for f in files:
        t = pq.read_table(f, columns=list(corpus.columns))
        ids = corpus.docids(t)
        texts = corpus.texts(t)
        for i in range(len(ids)):
            for pos, slt in enumerate(tok._spans_of(texts[i].as_py())):
                if slt is None:
                    continue
                for qid, (pls, var, qtc) in bags.items():
                    s = replay_score(pls, var, qtc, slt, window, eol)
                    if s > 0:
                        sc, insts = want[qid].get(slt, (s, set()))
                        insts.add((int(ids[i]), pos))
                        want[qid][slt] = (sc, insts)

    for qid in queries:
        ranked = sorted(want[qid].items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]
        exp_plain = {
            (qid, rank, d, p, expr, round(score, 9))
            for rank, (expr, (score, insts)) in enumerate(ranked, 1)
            for d, p in insts
        }
        got_plain = {
            (r["query_id"], r["rank"], r["docid"], r["pos"], r["expr"],
             round(r["score"], 9))
            for r in got
            if r["query_id"] == qid
        }
        assert exp_plain, qid
        assert got_plain == exp_plain
