"""The full three-step DAG (SURVEY §3.4): CSV universe -> bronze ->
fact + dim + quotes, idempotent under re-run."""

from __future__ import annotations

from etl_8million_data__spark.pipelines.run import run_all
from etl_8million_data__spark.sources.pyds import _fetch_one


def test_run_all_stages_end_to_end(spark, tmp_path):
    csv = tmp_path / "stocks_full.csv"
    csv.write_text(
        "symbol,company,industry,market_cap\n"
        "AAA,Alpha,Tech,32.42B\n"
        "BBB ,Beta,Energy,963.4M\n"   # needs strip-cleaning
        "AAA,Alpha Dup,Tech,32.42B\n"  # dedup on symbol
        ",NoSym,None,1B\n"             # dropped
        "CCC,Gamma,Retail,-\n"
    )
    wh = str(tmp_path / "wh")
    counts = run_all(spark, str(csv), wh, _fetch_one)
    assert counts["new_symbols"] == 3  # AAA BBB CCC
    # fixture payload: 3 statements x 2 freqs x 2 dates x 3 metrics
    assert counts["financials"] == 3 * 36
    assert counts["summary"] == 3
    assert counts["quotes"] == 2  # head(2) quote slice parity

    # re-run: incremental anti-join + keyed upserts => no growth
    again = run_all(spark, str(csv), wh, _fetch_one)
    assert again["new_symbols"] == 0
    assert again["financials"] == counts["financials"]
    assert again["summary"] == counts["summary"]
