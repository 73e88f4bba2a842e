"""TOML configuration, read-only after load — reference parity for
comlake.core's Configuration (src/comlake/core/Configuration.java:33-84).

The reference layers up to three TOML sources, later keys winning:

1. compiled-in fallback string (Configuration.java:37-42),
2. the site config  <site-config-dir>/comlake/core.toml,
3. the user config  <user-config-dir>/comlake/core.toml,

and silently falls back on any IO error (Configuration.java:56-60).  This
module reproduces that exactly, with two engine-specific differences:

- the storage backends differ (`psql-*` keys configure the reference's
  PostgreSQL; this engine's catalog is parquet-snapshot-based), so the
  `psql-*` keys are parsed for parity but the engine additionally reads
  `catalog-root` and `port` — `port` defaulting to 8090 like the
  reference's ``-main`` (main.clj:65);
- config *directories* come from XDG conventions rather than the appdirs
  JVM library (same resolution on Linux; overridable for tests and via
  ``$COMLAKE_CONFIG_DIR``).

``ipfs-multiaddr`` keeps the reference's multiaddr syntax (the Java IPFS
client consumed multiaddrs directly, InterPlanetaryFileSystem.java:47-52);
:func:`multiaddr_to_http` converts it for this engine's urllib transport.
"""

from __future__ import annotations

import os
import tomllib
from dataclasses import dataclass

FALLBACK = {
    # Configuration.java:37-42, verbatim defaults
    "ipfs-multiaddr": "/ip4/127.0.0.1/tcp/5001",
    "psql-url": "jdbc:postgresql:comlake",
    "psql-user": "postgres",
    "psql-passwd": "postgres",
    # engine extensions (not in the reference TOML; port mirrors the
    # reference -main default, catalog-root replaces the psql catalog)
    "port": 8090,
    "catalog-root": "",
}

_CFG_NAME = os.path.join("comlake", "core.toml")


def default_config_paths() -> tuple[str, str]:
    """(site, user) core.toml paths — the XDG equivalents of the appdirs
    lookups in Configuration.java:76-78.  ``$COMLAKE_CONFIG_DIR`` (if set)
    replaces the user path; tests pass explicit paths instead."""
    override = os.environ.get("COMLAKE_CONFIG_DIR")
    site = os.path.join(
        os.environ.get("XDG_CONFIG_DIRS", "/etc/xdg").split(os.pathsep)[0], _CFG_NAME
    )
    user = (
        os.path.join(override, "core.toml")
        if override
        else os.path.join(
            os.environ.get("XDG_CONFIG_HOME", os.path.expanduser("~/.config")),
            _CFG_NAME,
        )
    )
    return site, user


def _read_toml(path: str | None) -> dict:
    """Parse one TOML layer; missing/unreadable files fall back silently
    (Configuration.java:56-60 catches IOException and continues)."""
    if not path:
        return {}
    try:
        with open(path, "rb") as f:
            return tomllib.load(f)
    except (OSError, tomllib.TOMLDecodeError):
        return {}


@dataclass(frozen=True)
class Configuration:
    """Parsed configuration, intended for read-only use."""

    ipfs_multiaddr: str
    psql_url: str
    psql_user: str
    psql_passwd: str
    port: int
    catalog_root: str

    @classmethod
    def load(cls, site: str | None = None, user: str | None = None) -> "Configuration":
        """Layer fallback <- site <- user, later keys winning — the
        jezza-Toml multi-reader merge of Configuration.java:44-67.
        Defaults resolve PER ARGUMENT: overriding only the site path must
        not silently drop the user layer (the reference always consults
        both locations, Configuration.java:76-78)."""
        default_site, default_user = default_config_paths()
        site = default_site if site is None else site
        user = default_user if user is None else user
        merged = dict(FALLBACK)
        for layer in (_read_toml(site), _read_toml(user)):
            merged.update(layer)
        return cls(
            ipfs_multiaddr=str(merged["ipfs-multiaddr"]),
            psql_url=str(merged["psql-url"]),
            psql_user=str(merged["psql-user"]),
            psql_passwd=str(merged["psql-passwd"]),
            port=int(merged["port"]),
            catalog_root=str(merged["catalog-root"]),
        )


def multiaddr_to_http(multiaddr: str) -> str:
    """``/ip4/127.0.0.1/tcp/5001`` → ``http://127.0.0.1:5001``.

    Supports the transport multiaddrs the go-ipfs API listens on
    (/ip4, /ip6, /dns4, /dns6, /dnsaddr + /tcp/<port>, optional /http[s]).
    """
    parts = [p for p in multiaddr.split("/") if p]
    if len(parts) < 4 or parts[2] != "tcp":
        raise ValueError(f"unsupported multiaddr: {multiaddr!r}")
    proto, host, _, port = parts[0], parts[1], parts[2], parts[3]
    if proto not in ("ip4", "ip6", "dns4", "dns6", "dnsaddr"):
        raise ValueError(f"unsupported multiaddr protocol: {multiaddr!r}")
    scheme = "https" if "https" in parts[4:] else "http"
    hostpart = f"[{host}]" if proto == "ip6" else host
    return f"{scheme}://{hostpart}:{port}"


def build_store(cfg: Configuration):
    """The -main wiring step (main.clj:66-70): configuration → content
    store.  Returns an IpfsStore pointed at the configured multiaddr."""
    from comlake_core_spark.store.ipfs import IpfsStore

    return IpfsStore(api_base=multiaddr_to_http(cfg.ipfs_multiaddr))


def build_server(spark, cfg: Configuration, store=None, catalog=None):
    """Full -main parity (main.clj:63-70): Configuration → content store
    + catalog + HTTP server on the configured port.  ``catalog-root``
    plays the reference's psql-url role (this engine's catalog is
    parquet-snapshot-based); store/catalog can be injected for tests or
    a LocalStore deployment."""
    from comlake_core_spark.catalog.catalog import Catalog
    from comlake_core_spark.server import ComlakeServer

    if catalog is None:
        if not cfg.catalog_root:
            raise ValueError("catalog-root must be configured (or pass catalog=)")
        catalog = Catalog(spark, cfg.catalog_root)
    return ComlakeServer(spark, store or build_store(cfg), catalog, port=cfg.port)
