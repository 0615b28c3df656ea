"""Real-transport adapter (capital/sources/rest.http_fetcher): the
requests-backed Fetcher exercised against a LIVE local HTTP server
serving canned responses (round-11 verdict #7) — genuine sockets,
genuine requests encoding/headers handling, zero external network.
Covers the behaviors the injected test fetchers never reached:
Retry-After back-pressure, forced response encoding, retryable-vs-
fatal status discipline, POST-form APIs, and the end-to-end
PaginatedRestSource composition."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from capital.sources.rest import (
    PaginatedRestSource,
    RetryPolicy,
    TransientHTTPError,
    http_fetcher,
    requests_available,
)

pytestmark = pytest.mark.skipif(
    not requests_available(), reason="requests not installed"
)

#: Canned corpus: 5 records over page_size=2 → 3 pages.
_RECORDS = [{"isin": f"KR{i:04d}", "price": 100 + i} for i in range(5)]
_PAGE_SIZE = 2


#: The /protected challenge body; the expected clearance token is its sum.
_CHALLENGE_NUMS = [3, 14, 15, 92]


class _Handler(BaseHTTPRequestHandler):
    flaky_hits = {}  # path → hit count (class-level; server is per-test)
    challenge_hits = 0  # /protected 403-challenge responses served

    def log_message(self, *a):  # silence test output
        pass

    def _json(self, obj, status=200, headers=None, body_bytes=None):
        body = body_bytes or json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        url = urlparse(self.path)
        qs = parse_qs(url.query)
        if url.path == "/pages":
            page = int(qs.get("page", ["0"])[0])
            rows = _RECORDS[page * _PAGE_SIZE : (page + 1) * _PAGE_SIZE]
            self._json({"items": rows, "totalCount": len(_RECORDS)})
        elif url.path == "/flaky":
            # first hit per page: 429 + Retry-After, then success
            page = int(qs.get("page", ["0"])[0])
            hits = _Handler.flaky_hits.get(page, 0)
            _Handler.flaky_hits[page] = hits + 1
            if hits == 0:
                self._json(
                    {"error": "slow down"},
                    status=429,
                    headers={"Retry-After": "7"},
                )
            else:
                rows = _RECORDS[page * _PAGE_SIZE : (page + 1) * _PAGE_SIZE]
                self._json({"items": rows, "totalCount": len(_RECORDS)})
        elif url.path == "/protected":
            # Bot-protection model (the reference's cloudscraper
            # situation): without a clearance cookie the server
            # returns 403 + a deterministic challenge; with the
            # correct clearance it serves normal paginated data.
            cookies = {
                kv.split("=", 1)[0].strip(): kv.split("=", 1)[1]
                for kv in self.headers.get("Cookie", "").split(";")
                if "=" in kv
            }
            if cookies.get("clearance") == str(sum(_CHALLENGE_NUMS)):
                page = int(qs.get("page", ["0"])[0])
                rows = _RECORDS[page * _PAGE_SIZE : (page + 1) * _PAGE_SIZE]
                self._json({"items": rows, "totalCount": len(_RECORDS)})
            else:
                _Handler.challenge_hits += 1
                self._json({"challenge": _CHALLENGE_NUMS}, status=403)
        elif url.path == "/euckr":
            # Content-Type withholds the charset; the body is EUC-KR —
            # the reference's KRX-scraper situation (forced encoding).
            body = json.dumps(
                {"items": [{"name": "삼성전자"}], "totalCount": 1},
                ensure_ascii=False,
            ).encode("euc-kr")
            self._json(None, body_bytes=body)
        else:
            self._json({"error": "not found"}, status=404)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", "0"))
        form = parse_qs(self.rfile.read(n).decode())
        if urlparse(self.path).path == "/form":
            page = int(form.get("pageNo", ["0"])[0])
            rows = _RECORDS[page * _PAGE_SIZE : (page + 1) * _PAGE_SIZE]
            self._json(
                {
                    "items": rows,
                    "totalCount": len(_RECORDS),
                    "echo_market": form.get("market", [""])[0],
                }
            )
        else:
            self._json({"error": "not found"}, status=404)


@pytest.fixture()
def server():
    _Handler.flaky_hits = {}
    _Handler.challenge_hits = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_fetcher_paginates_end_to_end(server, spark):
    """GET pagination over real sockets: PaginatedRestSource drains
    all pages through the requests transport and reconciles against
    the API's own totalCount."""
    src = PaginatedRestSource(
        fetch_page=http_fetcher(
            lambda page: f"{server}/pages",
            params_for=lambda page: {"page": page},
        ),
        records_key="items",
        total_key="totalCount",
        page_size=_PAGE_SIZE,
        mode="page",
    )
    rows = list(src.records())
    assert rows == _RECORDS
    df = PaginatedRestSource(
        fetch_page=http_fetcher(
            lambda page: f"{server}/pages",
            params_for=lambda page: {"page": page},
        ),
        records_key="items",
        total_key="totalCount",
        page_size=_PAGE_SIZE,
        mode="page",
    ).to_dataframe(spark, "isin string, price long")
    assert df.count() == len(_RECORDS)


def test_http_fetcher_honors_retry_after_then_retry_succeeds(server):
    """429 + Retry-After: the fetcher sleeps the SERVER's delay (via
    the injected sleeper) and raises TransientHTTPError; a composed
    RetryPolicy narrowed to that class re-attempts and the second hit
    succeeds — the reference's scheduler-level retries, now at the
    fetch boundary and respecting server back-pressure."""
    slept = []
    fetch = http_fetcher(
        lambda page: f"{server}/flaky",
        params_for=lambda page: {"page": page},
        sleeper=slept.append,
    )
    retry = RetryPolicy(
        max_retries=2, delay_s=0.0, retry_on=TransientHTTPError
    )
    src = PaginatedRestSource(
        fetch_page=retry.wrap(fetch),
        records_key="items",
        total_key="totalCount",
        page_size=_PAGE_SIZE,
        mode="page",
    )
    assert list(src.records()) == _RECORDS
    # one 429 per page (3 pages), each sleeping the server's 7 s
    assert slept == [7.0, 7.0, 7.0]


def test_http_fetcher_retry_after_cap(server):
    """A hostile Retry-After cannot park the pipeline: the sleep is
    capped at max_retry_after_s."""
    slept = []
    fetch = http_fetcher(
        lambda page: f"{server}/flaky",
        params_for=lambda page: {"page": page},
        sleeper=slept.append,
        max_retry_after_s=0.5,
    )
    with pytest.raises(TransientHTTPError):
        fetch(0)
    assert slept == [0.5]


def test_http_fetcher_404_is_fatal_not_retried(server):
    """Status discipline: a 404 raises requests' HTTPError, which a
    retry_on=TransientHTTPError policy does NOT swallow — a missing
    resource is not a flaky host."""
    import requests

    attempts = []

    def url_for(page):
        attempts.append(page)
        return f"{server}/missing"

    fetch = RetryPolicy(
        max_retries=3, delay_s=0.0, retry_on=TransientHTTPError
    ).wrap(http_fetcher(url_for))
    with pytest.raises(requests.HTTPError):
        fetch(0)
    assert len(attempts) == 1  # no retries burned on a 404


def test_http_fetcher_forced_encoding(server):
    """The reference's KRX scrapers force EUC-KR on responses whose
    Content-Type withholds the charset; the adapter's encoding
    override must decode the Korean payload correctly."""
    fetch = http_fetcher(lambda page: f"{server}/euckr", encoding="euc-kr")
    payload = fetch(0)
    assert payload["items"][0]["name"] == "삼성전자"


def test_http_fetcher_post_form(server):
    """S3 (POST-form JSON API): form fields carry the cursor; the
    canned endpoint echoes a field back to prove the body went over
    the wire as application/x-www-form-urlencoded."""
    fetch = http_fetcher(
        lambda page: f"{server}/form",
        method="POST",
        data_for=lambda page: {"pageNo": str(page), "market": "KOSPI"},
    )
    p0 = fetch(0)
    assert p0["items"] == _RECORDS[:_PAGE_SIZE]
    assert p0["echo_market"] == "KOSPI"
    src = PaginatedRestSource(
        fetch_page=fetch,
        records_key="items",
        total_key="totalCount",
        page_size=_PAGE_SIZE,
        mode="page",
    )
    assert list(src.records()) == _RECORDS


def test_retry_after_http_date_parses_and_caps(monkeypatch):
    """RFC 9110 allows Retry-After as an HTTP-date; the parser must
    convert it to a bounded forward delta (and clamp past dates to
    0 rather than sleeping negative)."""
    from email.utils import formatdate

    from capital.sources.rest import _retry_after_seconds

    future = formatdate(__import__("time").time() + 30, usegmt=True)
    got = _retry_after_seconds(future, cap=120.0)
    assert got is not None and 25.0 <= got <= 30.5
    # far-future date hits the cap
    far = formatdate(__import__("time").time() + 10_000, usegmt=True)
    assert _retry_after_seconds(far, cap=60.0) == 60.0
    # past date clamps to zero (no negative sleeps)
    past = formatdate(__import__("time").time() - 50, usegmt=True)
    assert _retry_after_seconds(past, cap=60.0) == 0.0
    # garbage is ignored, not fatal
    assert _retry_after_seconds("next thursday-ish", cap=60.0) is None
    assert _retry_after_seconds(None, cap=60.0) is None


class _ChallengeSolvingSession:
    """Minimal cloudscraper-contract double: a requests.Session wrapper
    whose .request() transparently solves the server's 403 challenge
    (here: sum the canned numbers), stores the clearance cookie on the
    SAME underlying session, and replays the original request — then
    stays out of the way. This is the exact seam the reference's
    bot-protected scraper occupies (cloudscraper.create_scraper()
    returns a Session-compatible object;
    dags/brz_index_daily/extractors.py:10-40): anything implementing
    .request() drops into http_fetcher(session=...)."""

    def __init__(self):
        import requests

        self._sess = requests.Session()

    def request(self, method, url, **kwargs):
        resp = self._sess.request(method, url, **kwargs)
        if resp.status_code == 403:
            try:
                nums = resp.json().get("challenge")
            except ValueError:
                nums = None
            if nums is not None:  # solve once, cookie persists
                self._sess.cookies.set("clearance", str(sum(nums)))
                resp = self._sess.request(method, url, **kwargs)
        return resp


def test_fetcher_seam_accepts_challenge_solving_session(server):
    """S8 fetcher-contract (round-13 verdict ask #6): the bot-protected
    transport is an INJECTED SESSION, not a transport fork. A plain
    requests session 403s fatally on /protected; the challenge-solving
    session (cloudscraper's contract) drains every page through the
    same http_fetcher/PaginatedRestSource code path, solving the
    challenge exactly once — the clearance cookie persists across the
    per-fetcher pooled session."""
    import requests

    def make_source(session):
        return PaginatedRestSource(
            fetch_page=http_fetcher(
                lambda page: f"{server}/protected",
                params_for=lambda page: {"page": page},
                session=session,
            ),
            records_key="items",
            total_key="totalCount",
            page_size=_PAGE_SIZE,
            mode="page",
        )

    # Plain session: the 403 challenge is a FATAL status (not in
    # retry_statuses) — no silent retry storm against bot protection.
    with pytest.raises(requests.HTTPError):
        list(make_source(requests.Session()).records())
    assert _Handler.challenge_hits == 1

    _Handler.challenge_hits = 0
    rows = list(make_source(_ChallengeSolvingSession()).records())
    assert rows == _RECORDS
    assert _Handler.challenge_hits == 1  # solved once, reused 3 pages
