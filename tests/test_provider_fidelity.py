"""Per-provider fidelity: one test per shipped source config, each
pinning the quirk its reference provider file documents (VERDICT.md
round-1 item 5). Every test runs the REAL config from
``source_configs/`` through ``providers.processor`` over a tmp fixture
feed — so a user running that specific provider gets the reference's
semantics, not just the generic pipeline shape's.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from openaq_lcs_fetch_spark.config import resolve_paths
from openaq_lcs_fetch_spark.providers import processor

CFG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "openaq_lcs_fetch_spark",
    "source_configs",
)


def load_cfg(name: str, tmp_path, **meta_overrides):
    with open(os.path.join(CFG_DIR, f"{name}.json")) as f:
        cfg = json.load(f)
    cfg = resolve_paths(cfg, str(tmp_path))
    cfg["meta"].update(meta_overrides)
    return cfg


def write_jsonl(tmp_path, name: str, rows: list[dict]) -> None:
    d = tmp_path / name
    d.mkdir(parents=True, exist_ok=True)
    (d / "feed.jsonl").write_text("\n".join(json.dumps(r) for r in rows))


def keyed_row(device="d1", ts="2024-06-01T08:00:00", **readings) -> dict:
    return {
        "device_id": device,
        "ts": ts,
        "lat": 42.0,
        "lon": -71.0,
        "readings": readings,
    }


def write_csv(tmp_path, relpath: str, params: list[str], rows: list[tuple]) -> None:
    f = tmp_path / relpath
    f.parent.mkdir(parents=True, exist_ok=True)
    header = ["Anon_Name", "Site_Name", "Timestamp", "Lat", "Lon", *params]
    lines = [",".join(header)]
    for station, ts, *vals in rows:
        lines.append(",".join([station, f"site-{station}", ts, "40.0", "-80.0", *map(str, vals)]))
    f.write_text("\n".join(lines))


def by_param(measures) -> dict[str, list]:
    """sensor_id suffix (the measurand parameter, ids.py sensor_id) →
    sorted measures."""
    out: dict[str, list] = {}
    for r in measures.collect():
        out.setdefault(r.sensor_id.rsplit("-", 1)[-1], []).append(r)
    return {k: sorted(v, key=lambda r: (r.sensor_id, r.timestamp or dt.datetime.min)) for k, v in out.items()}


# --- keyed_map family -------------------------------------------------------


def test_senstate_size_channel_remap(spark, tmp_path):
    """senstate.js:15-18: the provider's 'PM10' channel is particulate
    ≤1µm (→ pm1) and 'PM100' is ≤10µm (→ pm10) — the remap is deliberate
    and MUST NOT be 'fixed' to the obvious mapping."""
    write_jsonl(tmp_path, "senstate", [keyed_row(PM10="5.0", PM100="30.0", PM25="10.0")])
    measures, _ = processor(spark, load_cfg("senstate", tmp_path))
    got = {r.sensor_id: r.measure for r in measures.collect()}
    assert got["senstate-d1-pm1"] == 5.0  # PM10 input → pm1
    assert got["senstate-d1-pm10"] == 30.0  # PM100 input → pm10
    assert got["senstate-d1-pm25"] == 10.0


def test_smartsense_inv_sentinel_and_zero_three_key(spark, tmp_path):
    """smartsense.js:114-118 recodes 'inv' to -999; SURVEY §2.11
    standardizes to NULL + flag instead — pin the divergence. Also the
    lookup's '03' (zero-three) typo key maps to o3 (smartsense.js:27),
    and 'T'→'t' is not API-supported (measurand.js:49-52) so
    temperature is silently dropped."""
    write_jsonl(
        tmp_path, "smartsense",
        [keyed_row(device="sm1", **{"PM2.5": "12.0", "03": "7.0", "T": "21.0", "PM10": "inv"})],
    )
    measures, _ = processor(spark, load_cfg("smartsense", tmp_path))
    rows = measures.collect()
    got = {r.sensor_id: r for r in rows}
    assert got["smartsense-sm1-pm25"].measure == 12.0
    assert got["smartsense-sm1-o3"].measure == 7.0  # '03' key
    assert not any(r.sensor_id.endswith("-t") for r in rows)  # 't' unsupported
    inv = got["smartsense-sm1-pm10"]
    assert inv.measure is None and inv.flags == {"qc/sentinel": "inv"}
    assert all(r.measure != -999 for r in rows if r.measure is not None)


def test_aernode_hour_ending_and_latest_set_drop(spark, tmp_path):
    """aernode.js:119 labels each reading hour-ENDING (time + 60 min);
    aernode.js:115-118 keeps the trailing 3 reading sets and drops the
    newest (still-running) one."""
    rows = [
        keyed_row(ts=f"2024-06-01T{h:02d}:00:00", **{"T-ext": f"{20+h}.0"})
        for h in (7, 8, 9, 10)  # 10:00 = newest set, 07:00 = beyond last-3
    ]
    write_jsonl(tmp_path, "aernode", rows)
    measures, _ = processor(spark, load_cfg("aernode", tmp_path))
    temps = {r.timestamp: r.measure for r in measures.collect()}
    # sets kept: 09:00 and 08:00 → hour-ending labels 10:00 and 09:00
    assert temps == {
        dt.datetime(2024, 6, 1, 10, 0): 29.0,
        dt.datetime(2024, 6, 1, 9, 0): 28.0,
    }


def test_aernode_new_device_still_registers_station(spark, tmp_path):
    """A device whose ONLY reading set is the dropped newest one must
    still appear in the station registry — stations derive from the
    device listing, not from the measurement window (aernode.js:104-113
    registers the node before slicing measurements)."""
    write_jsonl(tmp_path, "aernode", [
        keyed_row(device="fresh", ts="2024-06-01T10:00:00", **{"T-ext": "21.0"}),
    ])
    measures, stations = processor(spark, load_cfg("aernode", tmp_path))
    assert measures.count() == 0  # the lone (newest) set is dropped
    assert [s.sensor_node_id for s in stations.collect()] == ["fresh"]


def test_keyed_map_streaming_batch_same_lookup(spark, tmp_path):
    """The streaming twin must honor the same per-provider lookup as the
    batch path — senstate's PM10→pm1 remap applies on a stream too."""
    from openaq_lcs_fetch_spark.streaming.provider_stream import keyed_map_stream

    write_jsonl(tmp_path, "senstate", [keyed_row(PM10="5.0")])
    cfg = load_cfg("senstate", tmp_path)
    cfg["meta"]["path"] = str(tmp_path / "senstate")
    stream = keyed_map_stream(spark, cfg)
    q = (
        stream.writeStream.format("memory")
        .queryName("senstate_fid")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM senstate_fid").collect()
    assert [r.sensor_id for r in rows] == ["senstate-d1-pm1"]  # remap held


def test_airqo_two_parameter_whitelist(spark, tmp_path):
    """airqo.js:20-23: exactly pm2_5 and pm10 are ingested; other keys
    in the payload (airqo.js:115 key filter) never become measures."""
    write_jsonl(tmp_path, "airqo", [keyed_row(pm2_5="9.0", pm10="20.0", s2_pm2_5="8.5")])
    measures, _ = processor(spark, load_cfg("airqo", tmp_path))
    assert {r.sensor_id: r.measure for r in measures.collect()} == {
        "airqo-d1-pm25": 9.0,
        "airqo-d1-pm10": 20.0,
    }


def test_airqoon_calibrated_series_only_and_pa_scale(spark, tmp_path):
    """airqoon.js:19-27: only the *Calibrated series are ingested (raw
    'PM25' is not a lookup key, airqoon.js:159 filter); Pressure arrives
    in Pa and normalizes ÷100 to hPa (measurand.js:19-28)."""
    write_jsonl(
        tmp_path, "airqoon",
        [keyed_row(PM25Calibrated="10.0", PM25="99.0", Pressure="101325")],
    )
    measures, _ = processor(spark, load_cfg("airqoon", tmp_path))
    got = {r.sensor_id: r.measure for r in measures.collect()}
    assert got["airqoon-d1-pm25"] == 10.0  # calibrated, not 99.0
    assert got["airqoon-d1-pressure"] == pytest.approx(1013.25)
    assert len(got) == 2


def test_data354_key_spellings(spark, tmp_path):
    """data354.js:27-35: 'PM2_5' (underscore) and bare 'T' are the feed's
    spellings; timestamps are already UTC (data354.js:108)."""
    write_jsonl(tmp_path, "data354", [keyed_row(PM2_5="15.0", T="25.0", O3="33.0")])
    measures, _ = processor(spark, load_cfg("data354", tmp_path))
    got = {r.sensor_id: r for r in measures.collect()}
    assert got["data354-d1-pm25"].measure == 15.0
    assert got["data354-d1-temperature"].measure == 25.0
    assert got["data354-d1-o3"].timestamp == dt.datetime(2024, 6, 1, 8, 0)


def test_hawanama_single_parameter(spark, tmp_path):
    """hawanama.js:20-22: pm25 is the only supported lookup row."""
    write_jsonl(tmp_path, "hawanama", [keyed_row(pm25="7.0", no2="5.0")])
    measures, _ = processor(spark, load_cfg("hawanama", tmp_path))
    assert {r.sensor_id: r.measure for r in measures.collect()} == {
        "hawanama-d1-pm25": 7.0
    }


def test_lovemyair_unit_allowlist_and_last_three(spark, tmp_path):
    """lovemyair.js:121-122: parameters whose units are not in
    allowedUnits=['ug/m3'] are never fetched (voc/iaq dropped);
    lovemyair.js:127: only the last 3 measurements per sensor load."""
    rows = [
        keyed_row(ts=f"2024-06-01T{h:02d}:00:00", pm25=f"{h}.0", voc="120")
        for h in (5, 6, 7, 8)
    ]
    write_jsonl(tmp_path, "lovemyair", rows)
    measures, _ = processor(spark, load_cfg("lovemyair", tmp_path))
    got = by_param(measures)
    assert "voc" not in got
    assert sorted(r.measure for r in got["pm25"]) == [6.0, 7.0, 8.0]  # 05:00 aged out


def test_miri_metadata_element_and_key_spellings(spark, tmp_path):
    """miri.js:74: the device listing's first element is a metadata
    object (no device id) — it must not become a station or measures;
    miri.js:21-22: 'pmten'/'pmtwo' spellings."""
    meta_row = {"device_id": None, "ts": None, "lat": None, "lon": None,
                "readings": {"version": "2"}}
    write_jsonl(tmp_path, "miri", [meta_row, keyed_row(device="m1", pmten="40.0", pmtwo="18.0")])
    measures, stations = processor(spark, load_cfg("miri", tmp_path))
    got = {r.sensor_id: r.measure for r in measures.collect()}
    assert got == {"miri-m1-pm10": 40.0, "miri-m1-pm25": 18.0}
    assert [s.sensor_node_id for s in stations.collect()] == ["m1"]


def test_purpleair_particle_counts_pp100ml(spark, tmp_path):
    """purpleair.js:12-17: the um-count channels are pp100ml and
    normalize ÷100 to particles/cm³ (measurand.js:19-28); pm channels
    keep the 'pm1.0'/'pm2.5' dotted spellings (purpleair.js:9-11). The
    feed is the parallel-arrays shape {fields, data}
    (purpleair.js:127-143)."""
    d = tmp_path / "purpleair"
    d.mkdir(parents=True)
    doc = {
        "fields": ["sensor_index", "last_seen", "latitude", "longitude",
                   "0.3_um_count", "pm2.5", "pm1.0"],
        "data": [["pa1", "1717200000", "42.0", "-71.0", "1200", "10.0", "4.0"]],
    }
    (d / "resp.json").write_text(json.dumps(doc))
    measures, _ = processor(spark, load_cfg("purpleair", tmp_path))
    got = {r.sensor_id: r.measure for r in measures.collect()}
    assert got["purpleair-pa1-um003"] == pytest.approx(12.0)  # 1200 pp100ml
    assert got["purpleair-pa1-pm25"] == 10.0
    assert got["purpleair-pa1-pm1"] == 4.0


# --- wide_csv family --------------------------------------------------------


def test_cmu_local_time_parse_and_quarter_hour_shift(spark, tmp_path):
    """cmu.js:183-220: timestamps are 'YYYY-MM-DD HH_mm' wall-clock in
    America/New_York, shifted -15 min (sensor clocks run a quarter hour
    ahead); cmu.js:23-34: PM025 is the pm25 channel."""
    write_csv(
        tmp_path, "cmu/data.csv",
        ["CO", "NO", "NO2", "O3", "P", "PM025", "RH", "SO2", "T"],
        [("s1", "2019-03-01 05_15", "", "", "", "", "", "8.0", "", "", "")],
    )
    measures, _ = processor(spark, load_cfg("cmu", tmp_path))
    rows = measures.collect()
    assert len(rows) == 1
    # 05:15 EST -15min = 05:00 EST = 10:00 UTC
    assert rows[0].timestamp == dt.datetime(2019, 3, 1, 10, 0)
    assert rows[0].sensor_id == "cmu-s1-pm25"


def test_cpcb_kolkata_wall_clock_and_alias_fanin(spark, tmp_path):
    """cpcb.js:144-152: datetime_local is Asia/Kolkata wall-clock →
    UTC-5:30; cpcb.js:35-37: 'OZONE', 'O3' (and 'O3AAQMS') all fan in
    to the o3 parameter — one sensor, not three."""
    write_csv(
        tmp_path, "cpcb/data.csv",
        ["CO", "NO2", "OZONE", "O3", "PM25", "PM2.5", "SO2", "RH"],
        [("st1", "2024-06-01 08:00:00", "", "", "21.0", "22.0", "31.0", "32.0", "", "")],
    )
    measures, _ = processor(spark, load_cfg("cpcb", tmp_path))
    rows = measures.collect()
    assert all(r.timestamp == dt.datetime(2024, 6, 1, 2, 30) for r in rows)
    o3 = [r.measure for r in rows if r.sensor_id == "cpcb-st1-o3"]
    pm25 = [r.measure for r in rows if r.sensor_id == "cpcb-st1-pm25"]
    assert sorted(o3) == [21.0, 22.0] and sorted(pm25) == [31.0, 32.0]


def test_iqair_previous_day_refetch_and_hour_ending(spark, tmp_path):
    """iqair.js:167-201: every run re-reads the previous day's file
    because values arrive delayed — overlapping hours dedupe;
    iqair.js:142: 'Datetime_start(UTC)' + 1 h → hour-ending label."""
    cols = ["pm25(ug/m3)"]
    write_csv(tmp_path, "iqair/day=2024-06-01/data.csv", cols, [
        ("iq1", "2024-06-01 22:00:00", "41.0"),
        ("iq1", "2024-06-01 23:00:00", "42.0"),
    ])
    write_csv(tmp_path, "iqair/day=2024-06-02/data.csv", cols, [
        ("iq1", "2024-06-01 23:00:00", "42.0"),  # delayed duplicate
        ("iq1", "2024-06-02 00:00:00", "43.0"),
    ])
    measures, _ = processor(
        spark, load_cfg("iqair", tmp_path, as_of="2024-06-02T12:00:00")
    )
    got = {r.timestamp: r.measure for r in measures.collect()}
    assert got == {  # +1h hour-ending, duplicate hour collapsed
        dt.datetime(2024, 6, 1, 23, 0): 41.0,
        dt.datetime(2024, 6, 2, 0, 0): 42.0,
        dt.datetime(2024, 6, 2, 1, 0): 43.0,
    }


def test_airgradient_rolling_average_current_hour_dropped(spark, tmp_path):
    """airgradient.js:149-161: 'the current hour is always wrong because
    it's a rolling average' — rows in the as-of hour are excluded;
    airgradient.js:19-23: pm02 is the pm25 channel."""
    write_csv(
        tmp_path, "airgradient",
        ["pm01", "pm02", "pm003Count", "rhum", "atmp"],
        [
            ("ag1", "2024-06-01 09:00:00", "", "12.0", "", "", ""),
            ("ag1", "2024-06-01 10:05:00", "", "99.0", "", "", ""),  # current hour
        ],
    )
    # write_csv made a file named 'airgradient'; config expects a dir path
    measures, _ = processor(
        spark, load_cfg("airgradient", tmp_path, as_of="2024-06-01T10:30:00")
    )
    got = {r.sensor_id: r.measure for r in measures.collect()}
    assert got == {"airgradient-ag1-pm25": 12.0}


# --- enriched / mobile ------------------------------------------------------


def test_clarity_single_characteristic(spark, tmp_path):
    """clarity.js:27-29: pm2_5ConcMassIndividual is the only accepted
    characteristic; other characteristics on the feed never become
    measures, and the QC code rides as a flag (clarity.js:163)."""
    write_jsonl(tmp_path, "clarity", [
        {"measurement_id": "m1", "datasource_id": "ds1", "ts": "2024-06-01T00:00:00",
         "lat": 1.0, "lon": 2.0, "characteristic": "pm2_5ConcMassIndividual",
         "value": 14.0, "qc": "calibrated"},
        {"measurement_id": "m2", "datasource_id": "ds1", "ts": "2024-06-01T00:00:00",
         "lat": 1.0, "lon": 2.0, "characteristic": "pm10ConcMass",
         "value": 30.0, "qc": ""},
    ])
    write_jsonl(tmp_path, "clarity_datasources",
                [{"datasource_id": "ds1", "datasource_name": "clarity-site"}])
    measures, _ = processor(spark, load_cfg("clarity", tmp_path))
    rows = measures.collect()
    assert len(rows) == 1
    assert rows[0].sensor_id.endswith("-pm25") and rows[0].measure == 14.0
    assert rows[0].flags == {"enriched/qc": "calibrated"}


def habitatmap_fetcher(options: dict, page: int) -> list[tuple]:
    """Fixture feed: AirBeam2-qualified stream names, one unlisted."""
    base = 1_700_000_000 + page * 1000
    return [
        (f"sess-{page}", base, 40.0, -80.0, "AirBeam2-PM2.5", 9.5),
        (f"sess-{page}", base + 60, 40.0, -80.0, "AirBeam2-RH", 55.0),
    ]


def test_habitatmap_airbeam_stream_names_and_mobile_flag(spark, tmp_path):
    """habitatmap.js:9-12: the only supported stream is the
    device-qualified 'AirBeam2-PM2.5' (→ pm25); habitatmap.js:90:
    sessions are mobile — ismobile=true on every station."""
    cfg = load_cfg(
        "habitatmap", tmp_path,
        fetcher="tests.test_provider_fidelity:habitatmap_fetcher", pages="2",
    )
    measures, stations = processor(spark, cfg)
    rows = measures.collect()
    assert rows and all(r.sensor_id.endswith("-pm25") for r in rows)  # RH dropped
    assert all(r.measure == 9.5 for r in rows)
    st = stations.collect()
    assert st and all(s.sensor_node_ismobile for s in st)


def test_all_16_configs_have_provider_lookup():
    """Every shipped config carries its reference provider's measurand
    table (the per-provider quirk data) — no config silently falls back
    to the generic shape defaults."""
    names = sorted(f[:-5] for f in os.listdir(CFG_DIR) if f.endswith(".json"))
    assert len(names) == 16
    for name in names:
        with open(os.path.join(CFG_DIR, f"{name}.json")) as f:
            cfg = json.load(f)
        assert cfg["meta"].get("lookup"), f"{name} missing per-provider lookup"
