"""Gazetteer-based location detection.

Reference capability: modules/nlp/app/tuktu/nlp/processors/
LocationDetectionProcessor.scala:22-180 — match token windows (1..max_window
grams) against a geonames cities15000 table and a countries.json country
table, keep the highest-population entry per name, drop matches subsumed by
a longer match, optionally restrict to configured (lat, lon, radius)
centers.

Spark-first shape (the reference is a per-datum driver loop over in-memory
hash maps): the gazetteer is a DataFrame broadcast into an equi-join
against the exploded window table — the corpus side streams, the gazetteer
ships once per executor, and the subsumption filter is per-document array
algebra after a groupBy. Scale: windows are ~max_window x tokens rows; the
join is broadcast-hash (gazetteers are millions of rows at most — far
under executor memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GAZETTEER_SCHEMA = "name string, lat double, lon double, pop bigint"


def load_city_gazetteer(
    spark: SparkSession, path: str, min_alt_len: int = 5
) -> DataFrame:
    """Geonames cities TSV (cities15000 layout: name at col 1, asciiname
    at 2, comma-separated alternatenames at 3, lat 4, lon 5, population
    14) -> (name, lat, lon, pop), lowercased, one row per name/alt-name,
    keeping the highest-population entry per name. Alt names shorter than
    ``min_alt_len`` are dropped (the reference's false-positive guard,
    e.g. 'WAS' for Washington)."""
    raw = spark.read.option("sep", "\t").csv(path)
    base = raw.select(
        F.lower(F.col("_c1")).alias("utf8"),
        F.lower(F.col("_c2")).alias("ascii"),
        F.lower(F.col("_c3")).alias("alts"),
        F.col("_c4").cast("double").alias("lat"),
        F.col("_c5").cast("double").alias("lon"),
        F.coalesce(F.col("_c14").cast("bigint"), F.lit(0)).alias("pop"),
    )
    names = base.select(
        F.explode(
            F.array_union(
                F.array("utf8", "ascii"),
                F.filter(
                    F.split(F.coalesce(F.col("alts"), F.lit("")), ","),
                    lambda a: F.length(a) >= min_alt_len,
                ),
            )
        ).alias("name"),
        "lat", "lon", "pop",
    ).filter(F.col("name") != "")
    return _dedupe_by_pop(names)


def load_country_gazetteer(spark: SparkSession, path: str) -> DataFrame:
    """countries.json (mledoze/countries layout) -> (name, lat, lon, pop=0):
    common name + common translations + altSpellings ('USA' or length > 3),
    lowercased."""
    import json

    rows = []
    # countries.json is a single ~250-entry document: driver-side parse is
    # the honest shape (same as the reference), the RESULT is broadcast
    with open(path) as fh:
        for entry in json.load(fh):
            latlng = entry.get("latlng") or [None, None]
            if latlng[0] is None:
                continue
            names = {str(entry["name"]["common"])}
            for tr in (entry.get("translations") or {}).values():
                if isinstance(tr, dict) and tr.get("common"):
                    names.add(str(tr["common"]))
            for alt in entry.get("altSpellings") or []:
                if alt == "USA" or len(str(alt)) > 3:
                    names.add(str(alt))
            for name in names:
                rows.append((name.lower(), float(latlng[0]), float(latlng[1]), 0))
    return spark.createDataFrame(rows, GAZETTEER_SCHEMA)


def _dedupe_by_pop(names: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("name").orderBy(
        F.col("pop").desc(), F.col("lat").asc(), F.col("lon").asc()
    )
    return (
        names.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def detect_locations(
    df: DataFrame,
    tokens_col: str,
    gazetteer: DataFrame,
    max_window: int = 3,
    centers: list[tuple[float, float, float]] | None = None,
    out_col: str = "locations",
) -> DataFrame:
    """Append ``out_col``: array<struct<name,lat,lon>> of gazetteer matches
    for each row's token array. Windows of 1..max_window tokens join the
    broadcast gazetteer; matches subsumed by a longer match in the same
    document are dropped; ``centers`` (lat, lon, radius) keeps only
    matches within euclidean-degree radius of some center (the
    reference's filter). As in the reference
    (LocationDetectionProcessor: getLocations subsumes, the processor
    then filters by centers), subsumption runs BEFORE the centers
    filter — so a short match subsumed by a longer out-of-center match
    is dropped, not resurrected."""
    base = df.withColumn("__rid", F.monotonically_increasing_id())
    toks = F.transform(F.col(tokens_col), lambda t: F.lower(t))

    def windows_of(n):
        cnt = F.size(F.col(tokens_col)) - (n - 1)
        return F.when(
            cnt >= 1,
            F.transform(
                F.sequence(F.lit(1), cnt),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    all_windows = F.concat(*[windows_of(n) for n in range(1, max_window + 1)])
    exploded = base.select("__rid", F.explode(all_windows).alias("name"))
    matched = exploded.join(F.broadcast(gazetteer), "name")
    per_doc = matched.groupBy("__rid").agg(
        F.array_distinct(
            F.collect_list(F.struct("name", "lat", "lon"))
        ).alias("__m")
    )
    # subsumption: drop a match whose name is contained in another,
    # longer match of the same document (per-doc array algebra; match
    # sets are tiny)
    keep = F.filter(
        F.col("__m"),
        lambda m: ~F.exists(
            F.col("__m"),
            lambda n: (n["name"] != m["name"])
            & F.contains(n["name"], m["name"]),
        ),
    )
    if centers:
        def near_some_center(m):
            cond = None
            for lat, lon, radius in centers:
                c = (
                    F.sqrt(
                        F.pow(m["lat"] - F.lit(float(lat)), 2)
                        + F.pow(m["lon"] - F.lit(float(lon)), 2)
                    )
                    <= float(radius)
                )
                cond = c if cond is None else (cond | c)
            return cond

        keep = F.filter(keep, near_some_center)
    out = base.join(per_doc, "__rid", "left").withColumn(
        out_col,
        F.coalesce(keep, F.array().cast("array<struct<name:string,lat:double,lon:double>>")),
    )
    return out.drop("__rid", "__m")
