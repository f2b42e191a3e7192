"""HTTP serving layer: the reference's REST surface (GET/POST
/<endpoint>/<mode> with data+options) answered by the in-memory serving
replica — transport adds nothing, Spark never runs on the query path."""

from __future__ import annotations

import base64
import json
import urllib.parse
import urllib.request

import pytest

from columbiaimagesearch_spark import http_api


@pytest.fixture(scope="module")
def domain_images(spark):
    from columbiaimagesearch_spark.sources import fixtures

    return fixtures.generate(n_images=200).to_spark(spark)["images"]


@pytest.fixture(scope="module")
def service(spark, domain_images):
    return http_api.ImageSearchService.build(spark, domain_images)


@pytest.fixture(scope="module")
def server(service):
    srv = http_api.make_server(service)
    http_api.serve_in_thread(srv)
    yield srv
    srv.shutdown()


def _url(server, mode, **params):
    host, port = server.server_address
    qs = urllib.parse.urlencode(params)
    return f"http://{host}:{port}/cuimgsearch/{mode}" + (f"?{qs}" if qs else "")


def _get(server, mode, **params) -> dict:
    with urllib.request.urlopen(_url(server, mode, **params), timeout=30) as r:
        return json.loads(r.read())


def test_byb64_self_retrieval(spark, domain_images, server):
    """An indexed image queried by its own bytes: itself at rank 1,
    distance 0 — end-to-end THROUGH the HTTP transport."""
    rows = domain_images.orderBy("sha1").limit(2).collect()
    data = ",".join(
        base64.b64encode(bytes(r["content"])).decode() for r in rows
    )
    out = _get(server, "byB64", data=data)
    assert "Timing" in out and len(out["images"]) == 2
    for row, entry in zip(rows, out["images"]):
        sims = entry["SimilarImages"]
        assert sims["ImageSha1s"][0] == row["sha1"]
        assert sims["Distances"][0] == 0.0
        assert sims["NumberImages"] == len(sims["ImageSha1s"]) == 10


def test_bysha1_matches_byb64(spark, domain_images, server):
    """bySHA1 probes the indexed item's resident vector — same answer as
    byB64 of the same image (featurization is deterministic)."""
    row = domain_images.orderBy("sha1").limit(1).collect()[0]
    via_sha1 = _get(server, "bySHA1", data=row["sha1"])
    via_b64 = _get(
        server, "byB64", data=base64.b64encode(bytes(row["content"])).decode()
    )
    assert (
        via_sha1["images"][0]["SimilarImages"]
        == via_b64["images"][0]["SimilarImages"]
    )


def test_options_near_dup_and_error_contract(spark, domain_images, server):
    """near_dup with an epsilon threshold keeps only the query itself;
    unknown options append errors instead of failing (api.py:192-215)."""
    row = domain_images.orderBy("sha1").limit(1).collect()[0]
    b64 = base64.b64encode(bytes(row["content"])).decode()
    out = _get(
        server, "byB64", data=b64,
        options=json.dumps(
            {"near_dup": True, "near_dup_th": 1e-6, "bogus_option": 1}
        ),
    )
    sims = out["images"][0]["SimilarImages"]
    assert sims["ImageSha1s"] == [row["sha1"]]
    assert any("Unknown option bogus_option" in e for e in out["errors"].values())


def test_post_form_and_json_bodies(spark, domain_images, server):
    row = domain_images.orderBy("sha1").limit(1).collect()[0]
    b64 = base64.b64encode(bytes(row["content"])).decode()
    url = _url(server, "byB64")
    # urlencoded form (the reference's request.form path)
    body = urllib.parse.urlencode({"data": b64}).encode()
    with urllib.request.urlopen(urllib.request.Request(url, data=body)) as r:
        form_out = json.loads(r.read())
    # JSON body (the reference's json.loads(form.keys()[0]) fallback)
    req = urllib.request.Request(
        url, data=json.dumps({"data": b64}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        json_out = json.loads(r.read())
    assert (
        form_out["images"][0]["SimilarImages"]
        == json_out["images"][0]["SimilarImages"]
    )
    # POST with no data key -> the reference's 'no data received' error
    with urllib.request.urlopen(urllib.request.Request(url, data=b"")) as r:
        assert json.loads(r.read()) == {"error": "no data received"}


def test_status_and_unknown_mode(server, service):
    st = _get(server, "status")
    assert st["status"] == "OK"
    assert int(st["nb_indexed"]) == service.searcher.n_items
    assert "API_uptime" in st and "last_refresh_time" in st
    err = _get(server, "definitely_not_a_mode")
    assert err["error"].startswith("unknown_mode: definitely_not_a_mode")


def test_refresh_indexes_new_images(spark, server, service):
    """The ST6 twin at the serving tier: new images extracted + encoded
    distributed, added to the replica with sha1 dedup — findable via the
    SAME running endpoint immediately after."""
    from columbiaimagesearch_spark.sources import fixtures

    new_images = fixtures.generate(n_images=230).to_spark(spark)["images"]
    fresh = new_images.orderBy("sha1").collect()
    known = set(service.sha1_to_ids)
    truly_new = [r for r in fresh if r["sha1"] not in known]
    assert truly_new, "fixture must produce unseen images"

    before = service.searcher.n_items
    admitted = service.refresh(new_images)
    assert admitted > 0 and service.searcher.n_items == before + admitted
    # re-refresh of the same relation is a no-op (sha1 dedup, ST4)
    assert service.refresh(new_images) == 0

    probe = truly_new[0]
    out = _get(
        server, "byB64",
        data=base64.b64encode(bytes(probe["content"])).decode(),
    )
    sims = out["images"][0]["SimilarImages"]
    assert sims["ImageSha1s"][0] == probe["sha1"]
    assert sims["Distances"][0] == 0.0


def test_view_image_sha1_returns_bytes(spark, domain_images, server, service):
    """view_image_sha1 (api.py:545-557): sha1 -> image bytes via an S5
    point-get against the images relation, MIME from the header sniffer;
    unknown sha1 -> 404."""
    row = domain_images.orderBy("sha1").limit(1).collect()[0]
    url = _url(server, "view_image_sha1", data=row["sha1"])
    with urllib.request.urlopen(url, timeout=60) as r:
        assert r.headers["Content-Type"].startswith("image/")
        assert r.read() == bytes(row["content"])
    bad = _url(server, "view_image_sha1", data="0" * 40)
    try:
        urllib.request.urlopen(bad, timeout=60)
        raise AssertionError("expected HTTP 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404
