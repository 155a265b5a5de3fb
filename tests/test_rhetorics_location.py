"""Rhetorics / persuasion / location detection.

Reference: modules/nlp/app/tuktu/nlp/models/Rhetorics.scala,
processors/{RhetoricsProcessor,PersuasionProcessor,
LocationDetectionProcessor}.scala.
"""

import json

import pytest
from pyspark.sql import functions as F

from tuktu_spark.ml.rhetorics_model import (
    FIGURES,
    persuasion_score,
    rhetorics_find,
)
from tuktu_spark.operators.registry import make_operator


def find(text, tags=None):
    toks = text.split(" ")
    return rhetorics_find(toks, tags or ["NN"] * len(toks))


class TestFigures:
    def test_epizeuxis_word_and_phrase(self):
        assert find("horror horror horror")["epizeuxis"] == 2
        assert find("give me a break give me a break")["epizeuxis"] == 1
        assert find("no repetition here at all")["epizeuxis"] == 0

    def test_polysyndeton_many_conjunctions(self):
        text = "money and power and houses and schools and lawns"
        toks = text.split(" ")
        tags = ["NN" if t != "and" else "CC" for t in toks]
        assert rhetorics_find(toks, tags)["polysyndeton"] == 1  # 'and' > 2x

    def test_anaphora_and_epistrophe(self):
        # phrases split on '.', heads equal, len >= 3
        got = find("choose wisely now . choose sony now")
        assert got["anaphora"] == 1  # both start with 'choose'
        assert got["epistrophe"] == 1  # both end with 'now'

    def test_anaphora_skips_determiner_heads(self):
        toks = "the cat sat . the dog ran".split(" ")
        tags = ["DT" if t == "the" else "NN" for t in toks]
        assert rhetorics_find(toks, tags)["anaphora"] == 0

    def test_epanalepsis(self):
        assert find("always low prices always")["epanalepsis"] >= 1
        assert find("nothing repeats in this line")["epanalepsis"] == 0

    def test_anadiplosis(self):
        got = find("the brave deserve the fair , the fair deserve jaeger")
        assert got["anadiplosis"] == 1

    def test_ploche_neighboring_phrases(self):
        got = find("i love banana , banana loves me")
        assert got["ploche"] >= 1

    def test_alliteration(self):
        assert find("wonderful weather")["alliteration"] == 1
        assert find("sally sells sea shells")["alliteration"] == 3

    def test_polyptoton(self):
        assert find("the fearful fear fears")["polyptoton"] == 3

    def test_all_figures_present_and_int(self):
        got = find("plain text")
        assert set(got) == set(FIGURES)
        assert all(isinstance(v, int) for v in got.values())


class TestPersuasion:
    def test_neutral_message_scores_zero(self):
        toks = ["plain", "words", "only"]
        score = persuasion_score(toks, ["NN"] * 3, {})
        assert score == pytest.approx(0.0)

    def test_emotion_alias_matches_axis_map(self):
        toks = ["plain", "words", "only"]
        tags = ["NN"] * 3
        s1 = persuasion_score(toks, tags, "happiness")
        s2 = persuasion_score(toks, tags, {"joySadness": 1.0})
        assert s1 == pytest.approx(s2)
        assert s1 != 0.0

    def test_rhetoric_counts_move_the_score(self):
        tags = ["NN"] * 3
        base = persuasion_score(["a", "b", "c"], tags, {})
        loaded = persuasion_score(["horror", "horror", "horror"], tags, {})
        assert loaded != pytest.approx(base)

    def test_operators(self, spark):
        df = spark.createDataFrame(
            [(["horror", "horror", "horror"], ["NN", "NN", "NN"], "happiness")],
            "tokens array<string>, tags array<string>, emotions string",
        )
        out = make_operator("rhetorics", {})(df)
        row = out.first()["rhetorics"]
        assert row["epizeuxis"] == 2
        out2 = make_operator("persuasion", {})(df)
        expected = persuasion_score(
            ["horror", "horror", "horror"], ["NN"] * 3, "happiness"
        )
        assert out2.first()["persuasion"] == pytest.approx(expected)


class TestLocationDetection:
    @pytest.fixture(scope="class")
    def gazetteer_files(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("gaz")
        # geonames cities15000 layout: 19 tab-separated columns
        def city_row(name, ascii_name, alts, lat, lon, pop):
            cols = [""] * 19
            cols[1], cols[2], cols[3] = name, ascii_name, alts
            cols[4], cols[5], cols[14] = str(lat), str(lon), str(pop)
            return "\t".join(cols)

        city_file = d / "cities.tsv"
        city_file.write_text(
            "\n".join(
                [
                    city_row("Amsterdam", "Amsterdam", "Mokum,AMS", 52.37, 4.89, 800000),
                    city_row("New York", "New York", "NYC12,Big Apple", 40.71, -74.0, 8000000),
                    # same name, smaller population: must lose the dedupe
                    city_row("Amsterdam", "Amsterdam", "", 42.94, -74.19, 18000),
                ]
            )
        )
        country_file = d / "countries.json"
        country_file.write_text(
            json.dumps(
                [
                    {
                        "name": {"common": "Netherlands"},
                        "translations": {"nld": {"common": "Nederland"}},
                        "altSpellings": ["NL", "Holland"],
                        "latlng": [52.5, 5.75],
                    }
                ]
            )
        )
        return str(city_file), str(country_file)

    def test_city_match_with_population_dedupe(self, spark, gazetteer_files):
        city_file, country_file = gazetteer_files
        df = spark.createDataFrame(
            [(1, ["i", "visited", "amsterdam", "yesterday"])],
            "id int, tokens array<string>",
        )
        out = make_operator(
            "location_detect", {"city_file": city_file}
        )(df)
        locs = out.first()["locations"]
        assert len(locs) == 1
        assert locs[0]["name"] == "amsterdam"
        assert locs[0]["lat"] == pytest.approx(52.37)  # big Amsterdam wins

    def test_multiword_window_subsumes_single(self, spark, gazetteer_files):
        city_file, _ = gazetteer_files
        df = spark.createDataFrame(
            [(1, ["flying", "to", "new", "york", "tonight"])],
            "id int, tokens array<string>",
        )
        out = make_operator("location_detect", {"city_file": city_file})(df)
        locs = out.first()["locations"]
        assert [loc["name"] for loc in locs] == ["new york"]

    def test_country_and_alt_names(self, spark, gazetteer_files):
        _, country_file = gazetteer_files
        df = spark.createDataFrame(
            [(1, ["greetings", "from", "holland"]), (2, ["nothing", "here"])],
            "id int, tokens array<string>",
        )
        out = make_operator("location_detect", {"country_file": country_file})(df)
        got = {r["id"]: r["locations"] for r in out.collect()}
        assert got[1][0]["name"] == "holland"
        assert got[2] == []  # no match -> empty array, row kept
        # short alt 'NL' must have been dropped (len <= 3 and not USA)
        df2 = spark.createDataFrame([(1, ["nl"])], "id int, tokens array<string>")
        out2 = make_operator("location_detect", {"country_file": country_file})(df2)
        assert out2.first()["locations"] == []

    def test_centers_filter(self, spark, gazetteer_files):
        city_file, _ = gazetteer_files
        df = spark.createDataFrame(
            [(1, ["amsterdam", "and", "new", "york"])],
            "id int, tokens array<string>",
        )
        out = make_operator(
            "location_detect",
            {"city_file": city_file, "centers": [[52.0, 5.0, 3.0]]},
        )(df)
        locs = out.first()["locations"]
        assert [loc["name"] for loc in locs] == ["amsterdam"]

    def test_subsumption_runs_before_centers_filter(self, spark, tmp_path):
        # reference order: subsume first, THEN filter by centers — so a
        # short match ("york", in-center) subsumed by a longer match
        # ("new york", out-of-center) is dropped, not resurrected
        def city_row(name, lat, lon, pop):
            cols = [""] * 19
            cols[1] = cols[2] = name
            cols[4], cols[5], cols[14] = str(lat), str(lon), str(pop)
            return "\t".join(cols)

        city_file = tmp_path / "cities.tsv"
        city_file.write_text(
            "\n".join(
                [
                    city_row("York", 52.0, 5.0, 200000),  # inside center
                    city_row("New York", 40.71, -74.0, 8000000),  # outside
                ]
            )
        )
        df = spark.createDataFrame(
            [(1, ["new", "york"])], "id int, tokens array<string>"
        )
        out = make_operator(
            "location_detect",
            {"city_file": str(city_file), "centers": [[52.0, 5.0, 3.0]]},
        )(df)
        assert out.first()["locations"] == []

    def test_short_alt_city_names_dropped(self, spark, gazetteer_files):
        city_file, _ = gazetteer_files
        df = spark.createDataFrame([(1, ["ams"])], "id int, tokens array<string>")
        out = make_operator("location_detect", {"city_file": city_file})(df)
        assert out.first()["locations"] == []
        df2 = spark.createDataFrame([(1, ["mokum"])], "id int, tokens array<string>")
        out2 = make_operator("location_detect", {"city_file": city_file})(df2)
        assert out2.first()["locations"][0]["name"] == "mokum"