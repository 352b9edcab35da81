"""Repetition scoring: boilerplate must score high, varied text low."""

from covid_engineering_spark.operators.text import q_text_repetition


def test_repetition_flags_boilerplate(spark, tmp_path, monkeypatch):
    import covid_engineering_spark.operators.text as text_mod

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam", "en", "s", 30),
            (2, "one two three four five six", "en", "s", 27),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(
        text_mod, "read_table", lambda spark, sf, name: docs
    )
    out = {r["doc_id"]: r for r in q_text_repetition(spark, "ignored").collect()}
    assert out[1]["top_word_ratio"] == 1.0
    assert out[1]["top_trigram_ratio"] == 1.0
    assert out[2]["top_word_ratio"] < 0.2
    assert out[2]["top_trigram_ratio"] == 0.25


def test_repetition_drops_docs_shorter_than_a_trigram(spark, monkeypatch):
    # Docs with <3 words have no trigrams. An unguarded
    # sequence(0, size-3) counts downward and slice(ws, 0, 3) throws,
    # killing the whole query; the guarded form must instead drop the
    # short doc (no trigram rows -> inner join removes it), matching
    # the oracle.
    import covid_engineering_spark.operators.text as text_mod

    docs = spark.createDataFrame(
        [
            (1, "lone", "en", "s", 4),
            (2, "two words", "en", "s", 9),
            (3, "three whole words here", "en", "s", 22),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(text_mod, "read_table", lambda spark, sf, name: docs)
    out = {r["doc_id"]: r for r in q_text_repetition(spark, "ignored").collect()}
    assert set(out) == {3}
    assert out[3]["top_trigram_ratio"] == 0.5
