"""Curation operators (stages/curation.py): PII redaction parity with
DuckDB's RE2, Gopher repetition rules vs hand-computed docs, planted
benchmark decontamination."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from hyperion_crawler_ray.stages.curation import (
    EMAIL_RE,
    PHONE_RE,
    GopherRules,
    benchmark_ngram_hashes,
    decontaminate,
    redact_pii,
)


def test_redact_pii_matches_duckdb_re2():
    import duckdb

    texts = [
        "reach me at alice.smith+spam@example.co.uk or call +44 20 7946 0958",
        "no pii here at all, just words",
        "two mails a@b.io c.d@e-f.org and a phone 555-123-4567 inline",
        "",
    ]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(4), "text": texts}))
    got = redact_pii(ds, "text").to_pandas().sort_values("doc_id")
    con = duckdb.connect()
    exp = con.execute(f"""
        SELECT len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
               regexp_replace(
                 regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{PHONE_RE}', '<PHONE>', 'g') AS red
        FROM (SELECT unnest(?) AS text)""", [texts]).fetchdf()
    assert got["n_emails"].tolist() == exp["n_emails"].astype(int).tolist()
    assert got["text_redacted"].tolist() == exp["red"].tolist()
    assert got.loc[got.doc_id == 0, "n_emails"].iloc[0] == 1
    assert got.loc[got.doc_id == 2, "n_emails"].iloc[0] == 2
    assert "<PHONE>" in got.loc[got.doc_id == 2, "text_redacted"].iloc[0]


def test_gopher_rules_flag_repetitive_docs():
    # genuinely varied lines: a templated suffix like "... plain words"
    # on every line would (correctly) trip the top-2-gram rule
    rng = np.random.RandomState(3)
    vocab = [f"word{i}" for i in range(200)]
    clean = "\n".join(" ".join(rng.choice(vocab, 8)) for _ in range(20))
    spam = "\n".join(["buy now buy now buy now"] * 20)
    df = pd.DataFrame({"doc_id": [1, 2], "text": [clean, spam]})
    out = GopherRules.stage(rd.from_pandas(df), concurrency=2) \
        .to_pandas().set_index("doc_id")
    assert bool(out.loc[1, "gopher_pass"])
    assert not bool(out.loc[2, "gopher_pass"])
    assert out.loc[2, "dup_line_frac"] == 19 / 20
    assert out.loc[1, "dup_line_frac"] == 0.0
    assert out.loc[2, "top2gram_frac"] > 0.2
    # deterministic across block layouts
    out2 = GopherRules.stage(
        rd.from_pandas(df, override_num_blocks=2), concurrency=2) \
        .to_pandas().set_index("doc_id")
    for c in ["dup_line_frac", "top2gram_frac", "symbol_word_ratio"]:
        assert (out[c] == out2[c]).all()


def test_decontaminate_flags_planted_overlap():
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(500)]
    docs = [" ".join(rng.choice(vocab, 40)) for _ in range(30)]
    bench = ["held out benchmark question " + " ".join(
        f"b{i}_{k}" for k in range(20)) for i in range(3)]
    # plant: doc 5 embeds a full 13-gram run from bench[0]
    docs[5] = docs[5] + " " + " ".join(bench[0].split()[:15])
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(30), "text": docs}),
                        override_num_blocks=4)
    out = decontaminate(ds, "text", "doc_id",
                        benchmark_ngram_hashes(bench, n=13), n=13) \
        .to_pandas().set_index("doc_id")
    assert bool(out.loc[5, "contaminated"])
    assert out.loc[5, "n_overlap"] >= 1
    clean = out.drop(index=5)
    assert not clean["contaminated"].any()
    # append mode keeps the input columns
    out2 = decontaminate(ds, "text", "doc_id",
                         benchmark_ngram_hashes(bench, n=13), n=13,
                         append=True).to_pandas()
    assert {"text", "n_overlap", "contaminated"} <= set(out2.columns)
