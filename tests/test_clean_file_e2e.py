"""End-to-end clean_file tests mirroring the reference's observed behavior
on its dirty sample data: malformed transaction ids repaired by ffill+1,
three date formats normalized, currency parsed, duplicates and
out-of-range ids quarantined; flights fuzzy-corrected against previously
staged dims; run logs appended."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from date_warehouse___airline_project_spark.pipelines.clean_file import clean_file

TRANSACTIONS_CSV = """TransactionID,TransactionDate,PassengerID,FlightID,TicketPrice,Taxes,BaggageFees,TotalAmount
40001,2025-01-15,P10001,AA101,"$1,540.00",$120.00,$50.00,"$1,710.00"
4AN,01/20/2025,P10002,BB202,$300.00,$30.00,$0.00,$330.00
40003,20-Jan-25,P10003,CC303,$200.00,$20.00,$10.00,$230.00
40010,2025-02-01,P10004,DD404,$400.00,$40.00,$20.00,$460.00
40010,2025-02-01,P10004,DD404,$400.00,$40.00,$20.00,$460.00
40005,2025-02-02,P90001,EE505,$500.00,$50.00,$25.00,$575.00
40006,2025-02-03,P10006,FF606,$600.00,$60.00,$30.00,$690.00
"""

AIRLINES_CSV = """AirlineKey,AirlineName,Alliance
AA,American Airlines,oneworld
DL,Delta Air Lines,sky team
UA,United Airlines,Star Alliance
"""

AIRPORTS_CSV = """AirportKey,AirportName
JFK,John F Kennedy
LAX,Los Angeles
ORD,O'Hare
"""

FLIGHTS_CSV = """FlightKey,OriginAirportKey,DestinationAirportKey,AircraftType
AA100,JFK,LAX,boeing 737
AA101,JK,ORD,airbus a320
DK102,LAX,JFK,boeing 777
ZZ999,JFK,JFK,unknown craft
"""


@pytest.fixture()
def dirs(tmp_path):
    for d in ("staging", "quarantine", "logs", "in"):
        (tmp_path / d).mkdir()
    return tmp_path


def _write(dirs, name, content):
    p = dirs / "in" / name
    p.write_text(content)
    return str(p)


def test_transactions_end_to_end(spark, dirs):
    path = _write(dirs, "sales.csv", TRANSACTIONS_CSV)
    s = clean_file(
        spark, path, "transactions", str(dirs / "staging"), str(dirs / "quarantine"),
        str(dirs / "logs"),
    )
    assert s["rows_in"] == 7
    # dup row + out-of-range passenger quarantined; 4AN repaired to 40002
    assert s["rows_clean"] == 5 and s["rows_quarantined"] == 2

    staged = spark.read.parquet(
        str(dirs / "staging" / "staging_facttravelagencysales_source2_agency")
    )
    rows = {r.transactionid: r for r in staged.collect()}
    assert "40002" in rows  # ffill+1 repair of 4AN
    assert rows["40002"].transactiondate == "2025-01-20"  # MM/dd/yyyy normalized
    assert rows["40003"].transactiondate == "2025-01-20"  # dd-MMM-yy normalized
    assert rows["40001"].ticketprice == 1540.0  # currency + thousands strip
    quar = (dirs / "quarantine" / "quarantined_transactions.csv").read_text()
    assert "P90001" in quar and "duplicate" in quar

    logs = spark.read.parquet(str(dirs / "logs" / "etl_process_logs"))
    assert logs.filter(F.col("step_name") == "EXTRACT").count() == 1


def test_flights_fuzzy_against_staged_dims(spark, dirs):
    clean_file(spark, _write(dirs, "al.csv", AIRLINES_CSV), "airlines",
               str(dirs / "staging"), str(dirs / "quarantine"))
    clean_file(spark, _write(dirs, "ap.csv", AIRPORTS_CSV), "airports",
               str(dirs / "staging"), str(dirs / "quarantine"))
    s = clean_file(spark, _write(dirs, "fl.csv", FLIGHTS_CSV), "flights",
                   str(dirs / "staging"), str(dirs / "quarantine"))
    assert s["rows_in"] == 4
    staged = spark.read.parquet(str(dirs / "staging" / "staging_flights"))
    rows = {r.flightkey: r for r in staged.collect()}
    # JK hard-fixed to JFK; aircraft title-cased. DK102 and ZZ999 carry
    # unknown airline prefixes: a 1-edit on a 2-char code scores 50 < 85,
    # so fuzzy cannot repair them (same blind spot that made the reference
    # hard-code JK→JFK) → both quarantined as invalid_airline_prefix.
    assert rows["AA101"].originairportkey == "JFK"
    assert rows["AA100"].aircrafttype == "Boeing 737"
    assert set(rows) == {"AA100", "AA101"}
    assert s["rows_quarantined"] == 2
    quar = (dirs / "quarantine" / "quarantined_flights.csv").read_text()
    assert "invalid_airline_prefix" in quar and "DK102" in quar


def test_upsert_idempotent_reupload(spark, dirs):
    path = _write(dirs, "al.csv", AIRLINES_CSV)
    for _ in range(2):  # re-upload: keyed upsert, no duplicates
        clean_file(spark, path, "airlines", str(dirs / "staging"), str(dirs / "quarantine"))
    staged = spark.read.parquet(str(dirs / "staging" / "staging_airlines"))
    assert staged.count() == 3
    assert {r.alliance for r in staged.collect()} == {"Oneworld", "SkyTeam", "Star Alliance"}


def test_quarantine_csv_byte_parity_with_reference(spark, tmp_path):
    # Golden-bytes pin of write_quarantine_csv against the reference's
    # actual export semantics (cleaning.py:771-779): pandas
    # fillna('').to_csv(index=False, encoding='utf-8-sig') — BOM, header,
    # doubled embedded quotes, empty fields for nulls, trailing newline.
    # The expected bytes are produced BY pandas here, so the pin is to the
    # real engine, not a hand-transcribed literal.
    import pandas as pd

    from date_warehouse___airline_project_spark.sources.sinks import (
        write_quarantine_csv,
    )

    rows = [
        ("40001", "x,y comma", 'he said "hi"', "dup_key"),
        ("40002", None, "plain", "null_field"),
        ("40003", "trailing space ", None, "range"),
    ]
    cols = ["transactionid", "note", "comment", "quarantine_reason"]
    sdf = spark.createDataFrame(rows, cols)
    got_path = tmp_path / "quarantined_transactions.csv"
    write_quarantine_csv(sdf, str(got_path))

    ref_path = tmp_path / "ref.csv"
    pd.DataFrame(rows, columns=cols).fillna("").to_csv(
        ref_path, index=False, encoding="utf-8-sig"
    )
    got, want = got_path.read_bytes(), ref_path.read_bytes()
    assert got.startswith(b"\xef\xbb\xbf")
    assert got == want

    # empty quarantine: the reference writes pd.DataFrame().to_csv
    # (index=False) — exactly one newline, no header, no BOM
    empty_path = tmp_path / "quarantined_empty.csv"
    write_quarantine_csv(sdf.limit(0), str(empty_path))
    ref_empty = tmp_path / "ref_empty.csv"
    pd.DataFrame().to_csv(ref_empty, index=False)
    assert empty_path.read_bytes() == ref_empty.read_bytes() == b"\n"
