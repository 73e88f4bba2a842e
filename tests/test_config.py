"""TOML configuration parity tests (reference Configuration.java:33-84).

The reference's contract: layered TOML (fallback <- site <- user, later
wins), silent fallback on missing/broken files, read-only result.  Plus
the engine's multiaddr->HTTP bridge for the urllib IPFS transport.
"""

from __future__ import annotations

import pytest

from comlake_core_spark.config import (
    FALLBACK,
    Configuration,
    build_store,
    multiaddr_to_http,
)


def test_defaults_match_reference_fallback():
    # no files at all -> the compiled-in fallback of Configuration.java:37-42
    cfg = Configuration.load(site="/nonexistent/a.toml", user="/nonexistent/b.toml")
    assert cfg.ipfs_multiaddr == "/ip4/127.0.0.1/tcp/5001"
    assert cfg.psql_url == "jdbc:postgresql:comlake"
    assert cfg.psql_user == "postgres"
    assert cfg.psql_passwd == "postgres"
    assert cfg.port == 8090  # the reference -main default (main.clj:65)


def test_roundtrip_single_file(tmp_path):
    p = tmp_path / "core.toml"
    p.write_text(
        'ipfs-multiaddr = "/dns4/ipfs.example.org/tcp/5001"\n'
        "port = 9999\n"
        'catalog-root = "/srv/comlake/catalog"\n'
    )
    cfg = Configuration.load(site=str(p), user="/nonexistent/b.toml")
    assert cfg.ipfs_multiaddr == "/dns4/ipfs.example.org/tcp/5001"
    assert cfg.port == 9999
    assert cfg.catalog_root == "/srv/comlake/catalog"
    # untouched keys keep fallback values
    assert cfg.psql_user == "postgres"


def test_user_layer_overrides_site(tmp_path):
    # Configuration.java:50-54 case 3: site first, user wins on conflict
    site = tmp_path / "site.toml"
    user = tmp_path / "user.toml"
    site.write_text('psql-user = "site"\npsql-passwd = "s3"\n')
    user.write_text('psql-user = "user"\n')
    cfg = Configuration.load(site=str(site), user=str(user))
    assert cfg.psql_user == "user"      # user layer wins
    assert cfg.psql_passwd == "s3"      # site layer still applies
    assert cfg.psql_url == FALLBACK["psql-url"]  # fallback underneath


def test_broken_toml_falls_back_silently(tmp_path):
    # Configuration.java:56-60: IOException -> fall back silently
    p = tmp_path / "core.toml"
    p.write_text("this is [not toml")
    cfg = Configuration.load(site=str(p), user="/nonexistent/b.toml")
    assert cfg.ipfs_multiaddr == FALLBACK["ipfs-multiaddr"]


def test_configuration_is_read_only():
    cfg = Configuration.load(site="/nonexistent/a", user="/nonexistent/b")
    with pytest.raises(AttributeError):
        cfg.port = 1  # frozen dataclass: "intended for read-only use"


@pytest.mark.parametrize(
    ("multiaddr", "url"),
    [
        ("/ip4/127.0.0.1/tcp/5001", "http://127.0.0.1:5001"),
        ("/dns4/ipfs.example.org/tcp/5001", "http://ipfs.example.org:5001"),
        ("/ip6/::1/tcp/5001", "http://[::1]:5001"),
        ("/dns4/gw.example.org/tcp/443/https", "https://gw.example.org:443"),
    ],
)
def test_multiaddr_to_http(multiaddr, url):
    assert multiaddr_to_http(multiaddr) == url


@pytest.mark.parametrize("bad", ["", "/ip4/1.2.3.4", "/unix/tmp/sock", "/ip4/1.2.3.4/udp/5001"])
def test_multiaddr_rejects_unsupported(bad):
    with pytest.raises(ValueError):
        multiaddr_to_http(bad)


def test_build_store_points_at_configured_multiaddr(tmp_path):
    p = tmp_path / "core.toml"
    p.write_text('ipfs-multiaddr = "/dns4/ipfs-test.example.org/tcp/5009"\n')
    store = build_store(Configuration.load(site=str(p), user="/nonexistent/b.toml"))
    assert store.api == "http://ipfs-test.example.org:5009/api/v0"


def test_build_server_wires_port_store_catalog(tmp_path, spark):
    # -main parity: config -> store + catalog + server (main.clj:63-70)
    from comlake_core_spark.config import build_server
    from comlake_core_spark.store.local import LocalStore

    p = tmp_path / "core.toml"
    p.write_text(f'port = 18123\ncatalog-root = "{tmp_path}/cat"\n')
    cfg = Configuration.load(site=str(p), user="/nonexistent/b.toml")
    srv = build_server(spark, cfg, store=LocalStore(str(tmp_path / "cas")))
    assert srv.port == 18123
    assert srv.catalog.root == str(tmp_path) + "/cat"


def test_build_server_requires_catalog_root(spark):
    from comlake_core_spark.config import build_server

    cfg = Configuration.load(site="/nonexistent/a", user="/nonexistent/b")
    with pytest.raises(ValueError, match="catalog-root"):
        build_server(spark, cfg)


def test_single_explicit_path_keeps_other_layer(tmp_path, monkeypatch):
    # review r6 #6: overriding only the site path must not drop the user
    # layer — defaults resolve per argument (Configuration.java:76-78
    # always consults both locations)
    site = tmp_path / "site.toml"
    site.write_text('psql-user = "site"\n')
    user_dir = tmp_path / "cfg"
    (user_dir).mkdir()
    (user_dir / "core.toml").write_text('psql-passwd = "from-user-layer"\n')
    monkeypatch.setenv("COMLAKE_CONFIG_DIR", str(user_dir))
    cfg = Configuration.load(site=str(site))  # user path NOT passed
    assert cfg.psql_user == "site"
    assert cfg.psql_passwd == "from-user-layer"
