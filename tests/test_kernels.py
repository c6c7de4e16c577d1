"""Unit tests of the vectorized extraction kernels — the reference's own
unit-test vectors ported verbatim (citations per case)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from pgweasel_ray import kernels, severity as sev


def sev_of(*texts):
    name, rank = kernels.severity_columns(pa.array(list(texts)))
    return name.to_pylist(), rank.to_pylist()


class TestSeverity:
    def test_from_log_string_vectors(self):
        # severity.rs:203-211
        names, _ = sev_of(
            "string ERROR: string",
            '2025-05-21 10:57:10.100 UTC [596]: [1-1] db=postgres,user=postgres,'
            'host=91.129.106.131 ERROR:  syntax error at or near "sdaasdasda" '
            "at character 12025-05-21 10:57:10.100 UTC [596]: [2-1] "
            "db=postgres,user=postgres,host=91.129.106.131 STATEMENT:  sdaasdasda",
        )
        assert names == ["error", "error"]

    def test_needle_precedence_not_position(self):
        # severity.rs:62-101: LOG: is checked before ERROR:, so a record
        # containing both is Log even when ERROR: appears first.
        names, ranks = sev_of("x ERROR: then LOG: y")
        assert names == ["log"] and ranks == [5]

    def test_default_is_log(self):
        # severity.rs:99
        names, ranks = sev_of("no tag here: at all")
        assert names == ["log"] and ranks == [5]

    def test_every_needle(self):
        for needle, name in sev.PLAIN_NEEDLES:
            names, ranks = sev_of(f"prefix {needle} suffix")
            assert names == [name]
            assert ranks == [sev.RANK[name]]

    def test_rank_table(self):
        # severity.rs:161-176
        assert sev.RANK == {
            "debug5": 0, "debug4": 1, "debug3": 2, "debug2": 3, "debug1": 4,
            "log": 5, "info": 5, "notice": 6, "warning": 7, "error": 8,
            "fatal": 9, "panic": 0,
        }

    def test_cli_parsing(self):
        # severity.rs:179-196: case-insensitive; unknown (and "info"!) → info
        assert sev.severity_from_cli("ERROR") == "error"
        assert sev.severity_from_cli("error") == "error"
        assert sev.severity_from_cli("Debug5") == "debug5"
        assert sev.severity_from_cli("bogus") == "info"
        assert sev.severity_from_cli("info") == "info"


class TestMessage:
    def vec(self, *texts):
        return kernels.message_column(pa.array(list(texts))).to_pylist()

    def test_plain_message_vectors(self):
        # plain.rs:29-45
        assert self.vec(
            "2025-01-01 UTC [1] ERROR: bad thing happened\nError details..."
        ) == ["bad thing happened"]
        assert self.vec(
            "2025-08-27 17:35:28.619 EEST [275518] sitt@postgres FATAL:  "
            'password authentication failed for user "sitt"'
        ) == ['password authentication failed for user "sitt"']
        assert self.vec(
            "2025-05-21 11:01:20 UTC-682db26c.535-LOG:  disconnection: "
            "session time: 0:00:20.034 user=azuresu database=azure_maintenance "
            "host=127.0.0.1 port=55304"
        ) == [
            "disconnection: session time: 0:00:20.034 user=azuresu "
            "database=azure_maintenance host=127.0.0.1 port=55304"
        ]

    def test_no_colon_space_is_null(self):
        assert self.vec("nothing-to-extract") == [None]

    def test_spaces_skipped_and_newline_truncation(self):
        # plain.rs:7-16: spaces after ':' skipped, stops at first \n
        assert self.vec("a:    msg  with spaces\nnext") == ["msg  with spaces"]
        assert self.vec("a: \nnext") == [""]


class TestDuration:
    def ms(self, *texts):
        return kernels.duration_ms_column(pa.array(list(texts))).to_pylist()

    def test_reference_vectors(self):
        # duration.rs:61-72
        assert self.ms("Big text and duration: 121.997 ms more text") == [121.997]
        long = (
            "2025-05-21 11:00:40.296 UTC [675]: [3-1] db=postgres,"
            "user=cloudsqladmin,host=127.0.0.1 LOG:  duration: 3.032 ms  "
            "statement: SELECT extname FROM pg_catalog.pg_extension"
        )
        assert self.ms(long) == [3.032]

    def test_units(self):
        # duration.rs:43-54; ns/us truncate the value (``v as u64``)
        assert self.ms("duration: 1500 ns") == [1500 * 1e-6]
        assert self.ms("duration: 2500.9 us") == [2500 * 1e-3]
        assert self.ms("duration: 2 s") == [2000.0]
        assert self.ms("duration: 1.5 m x") == [90000.0]
        assert self.ms("duration: 1 min") == [60000.0]
        assert self.ms("duration: 1 minutes") == [60000.0]

    def test_invalid(self):
        assert self.ms("no duration here") == [None]
        assert self.ms("duration: abc") == [None]          # no digits
        assert self.ms("duration: 1.2.3 ms") == [None]     # bad float
        assert self.ms("duration: 5 parsecs") == [None]    # unknown unit
        assert self.ms("duration: 5") == [None]            # missing unit


class TestKv:
    def kv(self, field, *texts):
        return kernels.kv_column(pa.array(list(texts)), field).to_pylist()

    def test_reference_vectors(self):
        # format/mod.rs:74-88
        csv = (
            '2025-12-01 08:50:20.071 EET,"binsy","binsy",1653291,'
            '"10.203.8.108:50372",692d3aac.193a2b,3,"authentication",'
            '2025-12-01 08:50:20 EET,104/121,0,LOG,00000,'
            '"connection authorized: user=binsy database=binsy",,,,,,,,,"",'
            '"client backend",,0'
        )
        assert self.kv("user", csv) == ["binsy"]
        log = (
            "2021-02-14 01:34:02 CET [30291]: db=template1,user=postgres,"
            "app=[unknown],client=[local] LOG:  connection authorized: "
            "user=postgres database=template1 application_name=psql"
        )
        assert self.kv("user", log) == ["postgres"]

    def test_first_char_unconditional_quirk(self):
        # format/mod.rs:56-62: end starts at start+1, so the first char after
        # the needle is taken even when it is a terminator.
        assert self.kv("user", "x user=,host=1.2 y") == [",host=1.2"]
        assert self.kv("user", "connection authorized: user= database=d1") == [
            " database=d1"
        ]

    def test_terminators(self):
        assert self.kv("host", 'a host=10.0.0.1,port=5 b') == ["10.0.0.1"]
        assert self.kv("host", 'a host=h"quoted') == ["h"]
        assert self.kv("db", "x database=mydb end") == ["mydb"]
        assert self.kv("appname", "x application_name=psql y") == ["psql"]
        assert self.kv("host", "no needle") == [None]


class TestLockingFilter:
    def hits(self, *texts):
        return kernels.locking_mask(pa.array(list(texts))).to_pylist()

    def test_process_acquired_vectors(self):
        # locking_filter.rs:90-96
        assert self.hits(
            "process 123 acquired",
            "foo process 9 acquired bar",
            "xprocess 1 acquired",
            "process acquired",
            "process  acquired",
        ) == [True, True, True, False, False]

    def test_needles_case_insensitive(self):
        assert self.hits("DEADLOCK DETECTED here", "Deadlock detected") == [
            True,
            True,
        ]

    def test_process_acquired_case_sensitive(self):
        # locking_filter.rs:51-83 does byte comparison, unlike the automaton
        assert self.hits("PROCESS 123 ACQUIRED") == [False]

    def test_each_needle(self):
        from pgweasel_ray.patterns import LOCKING_NEEDLES

        for n in LOCKING_NEEDLES:
            assert self.hits(f"xx{n}yy") == [True], n

    def test_non_matches(self):
        assert self.hits("a normal statement", "conflictless") == [False, False]


class TestSystemFilter:
    def hits(self, *texts):
        return kernels.system_mask(pa.array(list(texts))).to_pylist()

    def test_reference_table(self):
        # system_filter.rs:66-90
        cases = [
            ("autovacuum process started", True),
            ("Background writer is active", True),
            ("WAL segment created", True),
            ("Database system is starting up", True),
            ("Reloading configuration file", True),
            ("Creating extension pg_stat_statements", True),
            ('listening on IPv4 address "127.0.0.1", port 54316', True),
            ("This is a normal log message", False),
            ("User logged in successfully", False),
        ]
        got = self.hits(*[c[0] for c in cases])
        assert got == [c[1] for c in cases]


class TestEvents:
    def test_event_classification(self):
        texts = pa.array(
            [
                "2025-01-01 UTC [1] LOG:  connection received: host=h port=1",
                "2025-01-01 UTC [1] LOG:  connection authorized: user=u "
                "database=d SSL enabled (TLSv1.3)",
                "2025-01-01 UTC [1] LOG:  connection authorized: user=u database=d",
                "2025-01-01 UTC [1] FATAL:  password authentication failed "
                'for user "u"',
                '2025-01-01 UTC [1] FATAL:  role "u" is not permitted to log in',
                "2025-01-01 UTC [1] FATAL:  terminating connection",
                "2025-01-01 UTC [1] LOG:  disconnection: session time: 0:00:01",
                # INFO has rank 5 like LOG but is NOT the Log enum value
                # (connections.rs:59 checks equality with Severity::Log):
                "2025-01-01 UTC [1] INFO:  connection received: host=h",
                "2025-01-01 UTC [1] LOG:  something else entirely: ok",
            ]
        )
        name, _ = kernels.severity_columns(texts)
        msg = kernels.message_column(texts)
        event, ssl = kernels.event_columns(texts, name, msg)
        assert event.to_pylist() == [
            "received", "authorized", "authorized", "auth_failure",
            "auth_failure", None, "disconnection", None, None,
        ]
        assert ssl.to_pylist() == [
            False, True, False, False, False, False, False, False, False,
        ]


class TestBucket:
    def test_epoch_floor(self):
        # error_histogram.rs:21-30: (ts / width) * width on epoch seconds
        import pandas as pd

        from pgweasel_ray.stages.parse import bucket_ts_column

        ts = pa.array(
            [pd.Timestamp("2025-05-22 15:18:10.123").value // 1000,
             pd.Timestamp("2025-05-22 15:59:59.999").value // 1000,
             pd.Timestamp("2025-05-22 16:00:00").value // 1000],
            type=pa.timestamp("us"),
        )
        got = bucket_ts_column(ts, 3600).to_pylist()
        assert [str(x) for x in got] == [
            "2025-05-22 15:00:00", "2025-05-22 15:00:00", "2025-05-22 16:00:00",
        ]


class TestSqlstate:
    def test_extract(self):
        got = kernels.sqlstate_column(
            pa.array(["ERROR:  bad (23503) thing", "no code", "x (40P01) y"])
        ).to_pylist()
        assert got == ["23503", None, "40P01"]

    def test_csv_field13_exact(self):
        # csv format reads the real sql_state_code column (field 13), not
        # the in-text heuristic — including when the message text contains
        # a DIFFERENT parenthesized code.
        rows = [
            # normal error row: f13=23505, message mentions (99999)
            '2025-05-08 12:24:37.731 EEST,"postgres","postgres",123,'
            '"[local]",681c6f94.7b,3,"INSERT",2025-05-08 12:24:00 EEST,'
            '3/15,0,ERROR,23505,"duplicate key (99999) in index",,,,,,'
            '"INSERT INTO t VALUES (1)",,,"psql","client backend",,0',
            # quoted field with embedded comma before f13 still aligns
            '2025-05-08 12:24:38.000 EEST,"pg","db",124,"[local]",s.1,4,'
            '"SELECT, WITH",2025-05-08 12:24:00 EEST,3/16,0,LOG,00000,'
            '"ok",,,,,,,,,"app",,,0',
            # too few fields → null
            "2025-05-08 12:24:39.000 EEST,only,three",
        ]
        got = kernels.sqlstate_column(pa.array(rows), fmt="csv").to_pylist()
        assert got == ["23505", "00000", None]
        # the plain heuristic on the same rows would have said 99999
        heur = kernels.sqlstate_column(pa.array(rows)).to_pylist()
        assert heur[0] == "99999"

    def test_csv_against_reference_corpus(self):
        """Every record of the reference's csvlogs: our csv extraction
        equals csv.reader's field 13."""
        import csv
        import io
        from pathlib import Path

        from pgweasel_ray.sources.rawlog import split_records

        for name in ("csvlog1.csv", "csvlog_pg12.csv", "csvlog_pg14.csv"):
            p = Path("/root/reference/testdata") / name
            if not p.exists():
                pytest.skip("reference testdata not available")
            recs = [r.decode() for r in split_records(p.read_bytes())]
            got = kernels.sqlstate_column(
                pa.array(recs), fmt="csv"
            ).to_pylist()
            for rec, code in zip(recs, got):
                row = next(csv.reader(io.StringIO(rec)))
                want = row[12] if len(row) >= 14 else None
                assert code == want, rec[:80]
