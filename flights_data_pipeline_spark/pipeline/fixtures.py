"""Deterministic flights-domain fixture generator (FIXTURES.md).

Reproduces the reference's staging-zone schema — 8 tables read off the
ER diagram ``images/warehousestg.png`` and the PK map
``start.sh:20-33`` — as a pure function of ``(seed, n_bookings)``.
Every row carries the reference's audit columns (``id`` uuid-format,
``created_at``, ``updated_at``; reference
``dags/flights_data_pipeline.py:102-109`` drives incremental extraction
off ``updated_at``), laid out over a 7-day window with the boundary /
blind-spot rows FIXTURES.md requires.

Generation is driver-side Python (fixture scale is small by design);
the *pipeline under test* is pure Spark. Surrogate ``id`` values are
md5-derived uuids — deterministic, per SURVEY.md §7.4.4.
"""

from __future__ import annotations

import hashlib
import json
import random
import datetime as dt
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: the 7-day incremental window (FIXTURES.md temporal layout).
DAYS = [dt.date(2025, 6, d) for d in range(10, 17)]
#: seats has no rows on this day → exercises skip-on-empty.
SEATS_EMPTY_DAY = dt.date(2025, 6, 13)

CREATED_AT = dt.datetime(2025, 6, 1, 0, 0, 0)

AIRCRAFT_CODES = ["773", "763", "SU9", "320", "321", "319", "733", "CN1", "CR2"]
AIRCRAFT_MODELS = {
    "773": ("Boeing 777-300", "Боинг 777-300", 11100),
    "763": ("Boeing 767-300", "Боинг 767-300", 7900),
    "SU9": ("Sukhoi Superjet-100", "Сухой Суперджет-100", 3000),
    "320": ("Airbus A320-200", "Аэробус A320-200", 5700),
    "321": ("Airbus A321-200", "Аэробус A321-200", 5600),
    "319": ("Airbus A319-100", "Аэробус A319-100", 6700),
    "733": ("Boeing 737-300", "Боинг 737-300", 4200),
    "CN1": ("Cessna 208 Caravan", "Сессна 208 Караван", 1200),
    "CR2": ("Bombardier CRJ-200", "Бомбардье CRJ-200", 2700),
}
FARES = ["Economy", "Comfort", "Business"]
STATUSES = ["Scheduled", "On Time", "Delayed", "Departed", "Arrived", "Cancelled"]
TIMEZONES = [
    "Europe/Moscow", "Asia/Novosibirsk", "Asia/Krasnoyarsk", "Asia/Irkutsk",
    "Asia/Yekaterinburg", "Asia/Vladivostok", "Europe/Kaliningrad",
    "Asia/Omsk", "Asia/Yakutsk", "Asia/Magadan", "Asia/Kamchatka",
    "Asia/Sakhalin", "Europe/Samara", "Europe/Volgograd", "Asia/Chita",
]

#: per-aircraft cabin layout: (rows, seat letters, business rows, comfort rows)
CABINS = {
    "773": (40, "ABCDEFGHK", 4, 5),
    "763": (30, "ABCDEFGH", 3, 4),
    "SU9": (20, "ABCDE", 2, 0),
    "320": (25, "ABCDEF", 3, 0),
    "321": (28, "ABCDEF", 3, 0),
    "319": (22, "ABCDEF", 2, 0),
    "733": (22, "ABCDEF", 2, 0),
    "CN1": (4, "AB", 0, 0),
    "CR2": (13, "ABCD", 1, 0),
}


def _uuid(table: str, *key) -> str:
    h = hashlib.md5(("|".join([table, *map(str, key)])).encode()).hexdigest()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def _day_ts(rng: random.Random, day: dt.date) -> dt.datetime:
    """A timestamp inside the day's closed extraction window."""
    sec = rng.randrange(0, 86399)  # 00:00:00 .. 23:59:58
    return dt.datetime.combine(day, dt.time()) + dt.timedelta(seconds=sec)


def generate(seed: int = 42, n_bookings: int = 2000) -> dict[str, list]:
    """All 8 staging tables as row-lists (pure function of the inputs)."""
    rng = random.Random(seed)

    aircrafts = [
        {
            "id": _uuid("aircrafts_data", c),
            "aircraft_code": c,
            "model": json.dumps(
                {"en": AIRCRAFT_MODELS[c][0], "ru": AIRCRAFT_MODELS[c][1]},
                ensure_ascii=False,
            ),
            "range": AIRCRAFT_MODELS[c][2],
            "created_at": CREATED_AT,
            "updated_at": _day_ts(rng, rng.choice(DAYS)),
        }
        for c in AIRCRAFT_CODES
    ]

    letters = "ABCDEFGHJKLMNPQRSTUVWXYZ"
    codes = set()
    while len(codes) < 104:
        codes.add("".join(rng.choice(letters) for _ in range(3)))
    airport_codes = sorted(codes)
    cities = [f"City{i:02d}" for i in range(90)]
    airports = []
    for i, code in enumerate(airport_codes):
        city = cities[i % 90]
        airports.append(
            {
                "id": _uuid("airports_data", code),
                "airport_code": code,
                "airport_name": json.dumps(
                    {"en": f"{city} {code} Airport", "ru": f"Аэропорт {code}"},
                    ensure_ascii=False,
                ),
                "city": json.dumps({"en": city, "ru": f"Город-{city}"}, ensure_ascii=False),
                "coordinates": (
                    round(rng.uniform(-180, 180), 6),
                    round(rng.uniform(-90, 90), 6),
                ),
                "timezone": rng.choice(TIMEZONES),
                "created_at": CREATED_AT,
                "updated_at": _day_ts(rng, rng.choice(DAYS)),
            }
        )

    seats = []
    for c in AIRCRAFT_CODES:
        nrows, cols, biz, comfort = CABINS[c]
        day_cycle = [d for d in DAYS if d != SEATS_EMPTY_DAY]
        for r in range(1, nrows + 1):
            fare = "Business" if r <= biz else ("Comfort" if r <= biz + comfort else "Economy")
            for col in cols:
                seats.append(
                    {
                        "id": _uuid("seats", c, f"{r}{col}"),
                        "aircraft_code": c,
                        "seat_no": f"{r}{col}",
                        "fare_conditions": fare,
                        "created_at": CREATED_AT,
                        "updated_at": _day_ts(rng, rng.choice(day_cycle)),
                    }
                )

    n_flights = max(200, int(0.3 * n_bookings))
    flight_nos = [f"PG{i:04d}" for i in range(1, max(2, n_flights // 30) + 1)]
    flights = []
    for fid in range(1, n_flights + 1):
        dep, arr = rng.sample(airport_codes, 2)
        code = rng.choice(AIRCRAFT_CODES)
        sched_dep = _day_ts(rng, rng.choice(DAYS))
        sched_arr = sched_dep + dt.timedelta(minutes=rng.randrange(30, 540))
        status = rng.choices(STATUSES, weights=[15, 15, 8, 12, 45, 5])[0]
        act_dep = act_arr = None
        if status in ("Departed", "Arrived"):
            delay = rng.randrange(-300, 21600)  # -5min .. +6h seconds, skewed low
            if rng.random() < 0.7:
                delay = rng.randrange(-300, 1800)
            act_dep = sched_dep + dt.timedelta(seconds=delay)
            if status == "Arrived":
                act_arr = sched_arr + dt.timedelta(seconds=delay + rng.randrange(-300, 900))
        flights.append(
            {
                "id": _uuid("flights", fid),
                "flight_id": fid,
                "flight_no": rng.choice(flight_nos),
                "scheduled_departure": sched_dep,
                "scheduled_arrival": sched_arr,
                "departure_airport": dep,
                "arrival_airport": arr,
                "status": status,
                "aircraft_code": code,
                "actual_departure": act_dep,
                "actual_arrival": act_arr,
                "created_at": CREATED_AT,
                "updated_at": _day_ts(rng, rng.choice(DAYS)),
            }
        )
    flight_by_id = {f["flight_id"]: f for f in flights}
    cabin_by_code = {}
    for s in seats:
        cabin_by_code.setdefault(s["aircraft_code"], []).append(
            (s["seat_no"], s["fare_conditions"])
        )

    n_passengers = max(2, int(0.9 * 1.4 * n_bookings))
    passengers = []
    first = ["IVAN", "OLGA", "PETR", "ANNA", "SERGEY", "ELENA", "DMITRY", "MARIA",
             "ALEX", "NINA", "YURI", "VERA", "PAVEL", "DARIA", "IGOR", "LIDIA"]
    last = ["IVANOV", "PETROV", "SIDOROV", "SMIRNOV", "KUZNETSOV", "POPOV",
            "VOLKOV", "FEDOROV", "MOROZOV", "NOVIKOV", "KOZLOV", "PAVLOV"]
    for i in range(n_passengers):
        pid = f"{rng.randrange(10000):04d} {rng.randrange(1000000):06d}"
        passengers.append((pid, f"{rng.choice(first)} {rng.choice(last)}"))

    bookings, tickets, ticket_flights, boarding_passes = [], [], [], []
    tno = 1000000000000
    bp_state: dict[int, list] = {}  # flight_id -> assigned seat indices
    for b in range(n_bookings):
        book_ref = f"{rng.randrange(16**6):06X}"
        day = rng.choice(DAYS)
        total = Decimal(0)
        n_tickets = rng.choices([1, 2, 3, 4], weights=[65, 22, 9, 4])[0]
        for _ in range(n_tickets):
            tno += 1
            ticket_no = str(tno)
            pid, pname = rng.choice(passengers)
            r = rng.random()
            if r < 0.01:
                contact = None
            elif r < 0.41:
                contact = json.dumps({"phone": f"+7{rng.randrange(10**10):010d}"})
            else:
                contact = json.dumps(
                    {
                        "phone": f"+7{rng.randrange(10**10):010d}",
                        "email": f"p{rng.randrange(10**6)}@example.com",
                    }
                )
            tickets.append(
                {
                    "id": _uuid("tickets", ticket_no),
                    "ticket_no": ticket_no,
                    "book_ref": book_ref,
                    "passenger_id": pid,
                    "passenger_name": pname,
                    "contact_data": contact,
                    "created_at": CREATED_AT,
                    "updated_at": _day_ts(rng, day),
                }
            )
            n_seg = rng.choices([1, 2, 3], weights=[55, 33, 12])[0]
            seg_flights = rng.sample(range(1, n_flights + 1), n_seg)
            for fid in seg_flights:
                fl = flight_by_id[fid]
                cabin = cabin_by_code[fl["aircraft_code"]]
                fare = rng.choice(sorted({f for _, f in cabin}))
                amount = Decimal(rng.randrange(30, 2001) * 100)
                total += amount
                ticket_flights.append(
                    {
                        "id": _uuid("ticket_flights", ticket_no, fid),
                        "ticket_no": ticket_no,
                        "flight_id": fid,
                        "fare_conditions": fare,
                        "amount": amount,
                        "created_at": CREATED_AT,
                        "updated_at": _day_ts(rng, day),
                    }
                )
                if fl["status"] in ("Departed", "Arrived") and rng.random() < 0.97:
                    used = bp_state.setdefault(fid, [])
                    if len(used) < len(cabin):
                        seat_no = cabin[len(used)][0]
                        used.append(seat_no)
                        boarding_passes.append(
                            {
                                "id": _uuid("boarding_passes", ticket_no, fid),
                                "ticket_no": ticket_no,
                                "flight_id": fid,
                                "boarding_no": len(used),
                                "seat_no": seat_no,
                                "created_at": CREATED_AT,
                                "updated_at": _day_ts(rng, day),
                            }
                        )
        bookings.append(
            {
                "id": _uuid("bookings", book_ref),
                "book_ref": book_ref,
                "book_date": _day_ts(rng, day),
                "total_amount": total,
                "created_at": CREATED_AT,
                "updated_at": _day_ts(rng, day),
            }
        )

    # window-boundary rows (FIXTURES.md): exactly 00:00:00 / 23:59:59, and
    # ~10 rows inside the reference's sub-second blind spot (> 23:59:59).
    for i, f in enumerate(flights[:4]):
        f["updated_at"] = dt.datetime.combine(DAYS[i % len(DAYS)], dt.time(0, 0, 0))
    for i, f in enumerate(flights[4:8]):
        f["updated_at"] = dt.datetime.combine(DAYS[i % len(DAYS)], dt.time(23, 59, 59))
    for i, tk in enumerate(tickets[: min(10, len(tickets))]):
        tk["updated_at"] = dt.datetime.combine(
            DAYS[i % len(DAYS)], dt.time(23, 59, 59, 500000)
        )

    return {
        "aircrafts_data": aircrafts,
        "airports_data": airports,
        "bookings": bookings,
        "tickets": tickets,
        "flights": flights,
        "seats": seats,
        "ticket_flights": ticket_flights,
        "boarding_passes": boarding_passes,
    }


def _audit(fields: list[T.StructField]) -> list[T.StructField]:
    return [
        T.StructField("id", T.StringType(), False),
        *fields,
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
    ]


SCHEMAS: dict[str, T.StructType] = {
    "aircrafts_data": T.StructType(_audit([
        T.StructField("aircraft_code", T.StringType(), False),
        T.StructField("model", T.StringType(), True),
        T.StructField("range", T.IntegerType(), True),
    ])),
    "airports_data": T.StructType(_audit([
        T.StructField("airport_code", T.StringType(), False),
        T.StructField("airport_name", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("coordinates", T.StructType([
            T.StructField("lon", T.DoubleType(), True),
            T.StructField("lat", T.DoubleType(), True),
        ]), True),
        T.StructField("timezone", T.StringType(), True),
    ])),
    "bookings": T.StructType(_audit([
        T.StructField("book_ref", T.StringType(), False),
        T.StructField("book_date", T.TimestampType(), True),
        T.StructField("total_amount", T.DecimalType(18, 2), True),
    ])),
    "tickets": T.StructType(_audit([
        T.StructField("ticket_no", T.StringType(), False),
        T.StructField("book_ref", T.StringType(), False),
        T.StructField("passenger_id", T.StringType(), True),
        T.StructField("passenger_name", T.StringType(), True),
        T.StructField("contact_data", T.StringType(), True),
    ])),
    "flights": T.StructType(_audit([
        T.StructField("flight_id", T.IntegerType(), False),
        T.StructField("flight_no", T.StringType(), True),
        T.StructField("scheduled_departure", T.TimestampType(), True),
        T.StructField("scheduled_arrival", T.TimestampType(), True),
        T.StructField("departure_airport", T.StringType(), True),
        T.StructField("arrival_airport", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("aircraft_code", T.StringType(), True),
        T.StructField("actual_departure", T.TimestampType(), True),
        T.StructField("actual_arrival", T.TimestampType(), True),
    ])),
    "seats": T.StructType(_audit([
        T.StructField("aircraft_code", T.StringType(), False),
        T.StructField("seat_no", T.StringType(), False),
        T.StructField("fare_conditions", T.StringType(), True),
    ])),
    "ticket_flights": T.StructType(_audit([
        T.StructField("ticket_no", T.StringType(), False),
        T.StructField("flight_id", T.IntegerType(), False),
        T.StructField("fare_conditions", T.StringType(), True),
        T.StructField("amount", T.DecimalType(18, 2), True),
    ])),
    "boarding_passes": T.StructType(_audit([
        T.StructField("ticket_no", T.StringType(), False),
        T.StructField("flight_id", T.IntegerType(), False),
        T.StructField("boarding_no", T.IntegerType(), True),
        T.StructField("seat_no", T.StringType(), True),
    ])),
}

#: column order per table (id first, audit last — matches SCHEMAS).
TABLES = list(SCHEMAS)


def as_dataframes(
    spark: SparkSession, seed: int = 42, n_bookings: int = 2000
) -> dict[str, DataFrame]:
    """Generate and return the 8 source tables as typed DataFrames."""
    data = generate(seed, n_bookings)
    out = {}
    for name, rows in data.items():
        schema = SCHEMAS[name]
        cols = [f.name for f in schema.fields]
        tuples = [tuple(r[c] for c in cols) for r in rows]
        out[name] = spark.createDataFrame(tuples, schema)
    return out


def write_source(
    spark: SparkSession, path: str, seed: int = 42, n_bookings: int = 2000
) -> None:
    """Materialize the source zone as parquet under ``path``."""
    for name, df in as_dataframes(spark, seed, n_bookings).items():
        df.write.mode("overwrite").parquet(f"{path}/{name}")
