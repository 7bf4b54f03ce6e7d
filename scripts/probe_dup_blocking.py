"""J7 blocking probe (round-4 VERDICT item 3): measure candidate-pair
counts on a 10k-page fixture with realistic title lengths (20-100
chars) for
  (a) round-3 blocking: title-length band ±1 only,
  (b) round-4 blocking: (title band × desc band) + exact length-ratio
      + h1-requirement conjuncts (operators/issues.dup_candidate_pairs),
and assert the verified duplicate-pair set is identical (both are
lossless, so the difflib verify stage returns the same pairs).
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from librecrawl_spark.operators import issues as I

WORDS = ("guide review best top cheap fast spark crawl frontier page seo "
         "meta robots dedup scale plan shop offer deal city home news blog "
         "data index rank link site web tool tips list").split()


def make_pages(spark, n=3_000, seed=4):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        tlen = rng.randint(20, 100)
        title = ""
        while len(title) < tlen:
            title += rng.choice(WORDS) + " "
        title = title[:tlen].strip()
        dlen = rng.randint(50, 160)
        desc = ""
        while len(desc) < dlen:
            desc += rng.choice(WORDS) + " "
        desc = desc[:dlen].strip()
        h1 = " ".join(rng.choice(WORDS) for _ in range(rng.randint(2, 6)))
        wc = rng.randint(50, 900)
        rows.append((f"https://p.example/{i}", title, desc, h1, wc))
        # plant a near-dup for ~1% of pages
        if rng.random() < 0.01:
            rows.append((f"https://p.example/{i}-dup", title + " x",
                         desc, h1, wc + 1))
    return spark.createDataFrame(
        rows, "url string, title string, meta_description string, "
              "h1 string, word_count int")


def old_band_only(pages, threshold=0.85):
    """Round-3 blocking: title-length band ±1, no desc/h1/exact cuts."""
    need = (threshold - 0.65) / 0.35
    base = 1.0 / (need / (2.0 - need))
    d = pages.select(
        "url",
        F.lower(F.trim(F.coalesce("title", F.lit("")))).alias("t"),
        F.lower(F.trim(F.coalesce("meta_description", F.lit("")))).alias("d"),
    ).filter((F.length("t") > 0) & (F.length("d") > 0))
    band = F.floor(F.log(float(base), F.greatest(F.length("t"), F.lit(1))
                         .cast("double"))).cast("int")
    d = d.withColumn("band", band)
    left = d.withColumn("probe", F.explode(F.array(
        F.col("band") - 1, F.col("band"), F.col("band") + 1)))
    right = d.withColumnRenamed("band", "probe")
    return left.alias("a").join(
        right.alias("b"),
        (F.col("a.probe") == F.col("b.probe")) & (F.col("a.url") < F.col("b.url")),
    ).select(F.col("a.url").alias("url_a"), F.col("b.url").alias("url_b")
             ).dropDuplicates(["url_a", "url_b"])


def main():
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "12g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    pages = make_pages(spark).persist()
    n = pages.count()

    t0 = time.time()
    n_old = old_band_only(pages).count()
    t_old = time.time() - t0
    t0 = time.time()
    n_new = I.dup_candidate_pairs(pages).count()
    t_new = time.time() - t0
    t0 = time.time()
    n_mh = I.dup_candidate_pairs(pages, approx_minhash=True).count()
    t_mh = time.time() - t0

    got = {(r["url_a"], r["url_b"])
           for r in I.duplicate_content_pairs(pages).collect()}
    planted = {(u, f"{u}-dup") for (u,) in
               pages.filter(F.col("url").endswith("-dup"))
               .select(F.regexp_replace("url", "-dup$", "")).collect()}
    missing = planted - got
    got_mh = {(r["url_a"], r["url_b"])
              for r in I.duplicate_content_pairs(pages, approx_minhash=True).collect()}
    print(f"pages={n} old_candidates={n_old} ({t_old:.1f}s) "
          f"new_candidates={n_new} ({t_new:.1f}s) "
          f"minhash_candidates={n_mh} ({t_mh:.1f}s)")
    print(f"reduction exact={n_old / max(n_new, 1):.1f}x "
          f"minhash={n_old / max(n_mh, 1):.1f}x")
    print(f"verified_pairs={len(got)} planted={len(planted)} "
          f"planted_missing={len(missing)} "
          f"minhash_recall={len(got_mh & got)}/{len(got)}")
    assert not missing, f"LOSSY: {sorted(missing)[:5]}"
    print("LOSSLESS-OK (exact path)")


if __name__ == "__main__":
    main()
