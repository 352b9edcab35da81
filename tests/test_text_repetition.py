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
