"""word_stem: Porter algorithm known-pairs + Spark UDF integration."""

from __future__ import annotations

import pytest

from lyft_presto_spark.operators.stemmer import porter_stem

# Classic pairs from the published Porter (1980) examples.
KNOWN = {
    "caresses": "caress",
    "ponies": "poni",
    "caress": "caress",
    "cats": "cat",
    "feed": "feed",
    "agreed": "agre",
    "plastered": "plaster",
    "motoring": "motor",
    "sing": "sing",
    "conflated": "conflat",
    "troubled": "troubl",
    "sized": "size",
    "hopping": "hop",
    "falling": "fall",
    "hissing": "hiss",
    "happy": "happi",
    "sky": "sky",
    "relational": "relat",
    "conditional": "condit",
    "rational": "ration",
    "valenci": "valenc",
    "digitizer": "digit",
    "operator": "oper",
    "feudalism": "feudal",
    "hopefulness": "hope",
    "formaliti": "formal",
    "triplicate": "triplic",
    "formative": "form",
    "formalize": "formal",
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv",
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "adjustable": "adjust",
    "defensible": "defens",
    "irritant": "irrit",
    "replacement": "replac",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    "communism": "commun",
    "activate": "activ",
    "angulariti": "angular",
    "homologous": "homolog",
    "effective": "effect",
    "bowdlerize": "bowdler",
    "probate": "probat",
    "rate": "rate",
    "cease": "ceas",
    "controll": "control",
    "roll": "roll",
}


@pytest.mark.parametrize("word,expected", sorted(KNOWN.items()))
def test_porter_known_pairs(word, expected):
    assert porter_stem(word) == expected


def test_word_stem_udf(spark, sf_dir):
    from lyft_presto_spark.operators.stemmer import word_stem
    from lyft_presto_spark.session import load_table

    spark.udf.register("word_stem", word_stem)
    docs = load_table(spark, sf_dir, "documents").limit(20)
    docs.createOrReplaceTempView("d20")
    rows = spark.sql(
        "SELECT word_stem(t) AS s FROM (SELECT explode(split(lower(text), ' ')) AS t FROM d20) WHERE t <> ''"
    ).collect()
    assert len(rows) > 0
    assert all(r["s"] for r in rows)
    # Spot-check through the full Spark path.
    one = spark.sql("SELECT word_stem('relational') AS s").collect()[0]["s"]
    assert one == "relat"
