"""Enrichment processors (SURVEY.md §2.5) — broadcast-join lookups,
hashes, CIDR classification, cross-event cache.

The canonical pattern: every reference processor that consults an
external directory (translate_sid, translate_ldap_attribute, dns,
add_docker/kubernetes/cloud_metadata) becomes a **broadcast left join**
against a pre-materialized lookup DataFrame — no live I/O in executors,
and at 100 TB the dimension stays on the map side (zero shuffle of the
fact table).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beats_spark.conditions import _ipv4_to_long
from beats_spark.fields import field_col, field_type, put_field
from beats_spark.processors.base import Processor, register
from beats_spark.processors.shape import _set_error


@register
class Lookup(Processor):
    """The generalized translate/add_*_metadata analog
    (translate_sid/translatesid.go:43,75-110; add_docker_metadata
    :59,150; dns/dns.go:42,80 — all key→attributes cache lookups).

    cfg:
      table:    a DataFrame (API use), or
      rows:     list[dict] (inline dimension), or
      path:     parquet path
      key_field:    event field to join on
      match_field:  dimension column holding the key (default = key_field)
      fields:       dimension columns to copy in (default: all non-key)
      target:       prefix for the copied columns ("" = top level)
      broadcast:    default True (dimensions are small by construction)

    Join-miss leaves the event unchanged (NULL enrich columns) —
    Beats' ignore_missing behavior (translatesid.go:75-80).
    """

    name = "lookup"

    def apply(self, df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        dim: DataFrame | None = self.cfg.get("table")
        if dim is None and self.cfg.get("rows"):
            dim = spark.createDataFrame(self.cfg["rows"])
        if dim is None and self.cfg.get("path"):
            dim = spark.read.parquet(self.cfg["path"])
        if dim is None:
            raise ValueError("lookup: one of table/rows/path required")
        key = self.cfg["key_field"]
        match = self.cfg.get("match_field", key.split(".")[-1])
        fields = self.cfg.get("fields") or [c for c in dim.columns if c != match]
        target = self.cfg.get("target", "")
        prefix = f"{target}." if target else ""
        ev_key = field_col(df, key)
        if ev_key is None:
            return df
        sel = [F.col(match).alias("__lk__")] + [
            F.col(c).alias(f"__lv_{c}__") for c in fields
        ]
        dim_p = dim.select(*sel).dropDuplicates(["__lk__"])
        joined = df.join(
            F.broadcast(dim_p) if self.cfg.get("broadcast", True) else dim_p,
            ev_key == F.col("__lk__"),
            "left",
        ).drop("__lk__")
        for c in fields:
            joined = put_field(joined, prefix + c, F.col(f"__lv_{c}__"))
            joined = joined.drop(f"__lv_{c}__")
        return joined


def _host_struct(cfg: dict[str, Any]) -> dict[str, Any]:
    import platform
    import socket

    return {
        "hostname": socket.gethostname(),
        "os.platform": platform.system().lower(),
        "os.kernel": platform.release(),
        "architecture": platform.machine(),
    }


@register
class AddHostMetadata(Processor):
    """add_host_metadata/add_host_metadata.go:119-139 — constant host
    info under `host.*`, skipped when the event carries the `forwarded`
    tag. Constants fold into the plan (lit), the Beats TTL cache is
    irrelevant in batch."""

    name = "add_host_metadata"

    def apply(self, df: DataFrame) -> DataFrame:
        info = _host_struct(self.cfg)
        tags = field_col(df, "tags")
        not_forwarded = (
            F.lit(True)
            if tags is None
            else ~F.coalesce(F.array_contains(tags, "forwarded"), F.lit(False))
        )
        for k, v in info.items():
            path = f"host.{k}"
            existing = field_col(df, path)
            keep = existing if existing is not None else F.lit(None).cast("string")
            df = put_field(df, path, F.when(not_forwarded, F.lit(v)).otherwise(keep))
        return df


@register
class AddAgentMetadata(Processor):
    """actions/add_agent_metadata.go:27 — constant agent descriptor."""

    name = "add_agent_metadata"

    def apply(self, df: DataFrame) -> DataFrame:
        df = put_field(df, "agent.type", F.lit("beats_spark"))
        df = put_field(df, "agent.version", F.lit("1.0.0"))
        return df


@register
class AddObserverMetadata(Processor):
    """add_observer_metadata/…:36 — constant observer descriptor."""

    name = "add_observer_metadata"

    def apply(self, df: DataFrame) -> DataFrame:
        import socket

        df = put_field(df, "observer.hostname", F.lit(socket.gethostname()))
        df = put_field(df, "observer.type", F.lit("beats_spark"))
        return df


_FP_METHODS = {"md5", "sha1", "sha256", "sha384", "sha512", "xxhash"}


@register
class Fingerprint(Processor):
    """fingerprint/fingerprint.go:40,72-116 — hash a sorted field set.

    Byte layout reproduced exactly: for each field in sorted order
    write `|key|value`, then a trailing `|` (fingerprint.go:93-116).
    Timestamps are UTC RFC3339-nanos; numbers use Go %v formatting
    (integers plain, no trailing .0). Missing field ⇒ error (we record
    _error and emit NULL). method: md5/sha1/sha256/sha384/sha512/xxhash;
    encoding hex (default)/base32/base64."""

    name = "fingerprint"

    def apply(self, df: DataFrame) -> DataFrame:
        fields = sorted(self.cfg.get("fields", []))
        method = self.cfg.get("method", "sha256")
        encoding = self.cfg.get("encoding", "hex")
        target = self.cfg.get("target_field", "fingerprint")
        parts: list[Column] = []
        missing = F.lit(False)
        for f in fields:
            col = field_col(df, f)
            if col is None:
                missing = F.lit(True)
                continue
            ft = field_type(df.schema, f)
            if isinstance(ft, T.TimestampType):
                sval = F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSS'Z'")
            elif isinstance(ft, (T.FloatType, T.DoubleType)):
                # Go %v prints integral floats without decimal point
                lval = col.cast("long")
                sval = F.when(
                    col.isNotNull() & (col == lval.cast("double")), lval.cast("string")
                ).otherwise(col.cast("string"))
            else:
                sval = col.cast("string")
            missing = missing | col.isNull()
            parts.extend([F.lit("|" + f + "|"), sval])
        payload = F.concat(*parts, F.lit("|")) if parts else F.lit("|")
        if method == "md5":
            digest_hex = F.md5(payload)
        elif method == "sha1":
            digest_hex = F.sha1(payload)
        elif method in ("sha256", "sha384", "sha512"):
            digest_hex = F.sha2(payload, int(method[3:]))
        elif method == "xxhash":
            digest_hex = F.lower(F.hex(F.xxhash64(payload)))
        else:
            raise ValueError(f"fingerprint: unsupported method {method}")
        if encoding == "hex":
            out = digest_hex
        elif encoding == "base64":
            out = F.base64(F.unhex(digest_hex))
        elif encoding == "base32":
            raise ValueError("fingerprint: base32 encoding not supported natively")
        else:
            raise ValueError(f"fingerprint: unknown encoding {encoding}")
        df = _set_error(df, missing, "fingerprint: missing field")
        return put_field(df, target, F.when(~missing, out))


@register
class CommunityId(Processor):
    """communityid/communityid.go:38,90 — v1 flow hash: seed(16be) +
    normalized 5-tuple, sha1, base64, '1:' prefix. Normalization orders
    (saddr,sport) <= (daddr,dport). Native: IPv4 packed via ip-to-long,
    sha1/unhex/base64 all JVM-side."""

    name = "community_id"

    def apply(self, df: DataFrame) -> DataFrame:
        src = field_col(df, self.cfg.get("source_ip", "source.ip"))
        dst = field_col(df, self.cfg.get("destination_ip", "destination.ip"))
        sport = field_col(df, self.cfg.get("source_port", "source.port"))
        dport = field_col(df, self.cfg.get("destination_port", "destination.port"))
        proto = field_col(df, self.cfg.get("transport", "network.transport"))
        target = self.cfg.get("target", "network.community_id")
        if any(c is None for c in (src, dst, sport, dport, proto)):
            return put_field(df, target, F.lit(None).cast("string"))
        seed = int(self.cfg.get("seed", 0))
        proto_num = (
            F.when(F.lower(proto) == "icmp", 1)
            .when(F.lower(proto) == "tcp", 6)
            .when(F.lower(proto) == "udp", 17)
            .when(F.lower(proto) == "sctp", 132)
            .otherwise(F.lit(None))
        ).cast("int")
        s_l, d_l = _ipv4_to_long(src), _ipv4_to_long(dst)
        sp = sport.cast("int")
        dp = dport.cast("int")
        flip = (s_l > d_l) | ((s_l == d_l) & (sp > dp))
        a_ip = F.when(flip, d_l).otherwise(s_l)
        b_ip = F.when(flip, s_l).otherwise(d_l)
        a_p = F.when(flip, dp).otherwise(sp)
        b_p = F.when(flip, sp).otherwise(dp)

        def be16(c: Column) -> Column:
            return F.lpad(F.hex(c.cast("long")), 4, "0")

        def be32(c: Column) -> Column:
            return F.lpad(F.hex(c.cast("long")), 8, "0")

        hexmsg = F.lower(
            F.concat(
                F.lpad(F.hex(F.lit(seed)), 4, "0"),
                be32(a_ip),
                be32(b_ip),
                F.lpad(F.hex(proto_num), 2, "0"),
                F.lit("00"),
                be16(a_p),
                be16(b_p),
            )
        )
        digest = F.sha1(F.unhex(hexmsg))
        cid = F.concat(F.lit("1:"), F.base64(F.unhex(digest)))
        ok = (
            s_l.isNotNull()
            & d_l.isNotNull()
            & proto_num.isNotNull()
            & sp.isNotNull()
            & dp.isNotNull()
        )
        return put_field(df, target, F.when(ok, cid))


@register
class AddNetworkDirection(Processor):
    """actions/add_network_direction.go:34,65 — classify src/dst IPs
    against `internal_networks` CIDRs: inbound/outbound/internal/
    external. Pure CIDR arithmetic (conditions._ipv4_to_long)."""

    name = "add_network_direction"

    def apply(self, df: DataFrame) -> DataFrame:
        src = field_col(df, self.cfg.get("source", "source.ip"))
        dst = field_col(df, self.cfg.get("destination", "destination.ip"))
        target = self.cfg.get("target", "network.direction")
        if src is None or dst is None:
            return df
        import ipaddress

        nets = []
        for c in self.cfg.get("internal_networks", ["private"]):
            from beats_spark.conditions import _NAMED_NETWORKS

            for cidr in _NAMED_NETWORKS.get(c, [c]):
                net = ipaddress.ip_network(cidr, strict=False)
                if net.version == 4:
                    nets.append((int(net.network_address), int(net.broadcast_address)))

        def internal(col: Column) -> Column:
            ipl = _ipv4_to_long(col)
            pred = F.lit(False)
            for lo, hi in nets:
                pred = pred | ((ipl >= F.lit(lo)) & (ipl <= F.lit(hi)))
            return F.coalesce(pred, F.lit(False))

        s_in, d_in = internal(src), internal(dst)
        direction = (
            F.when(s_in & d_in, "internal")
            .when(s_in, "outbound")
            .when(d_in, "inbound")
            .otherwise("external")
        )
        both = src.isNotNull() & dst.isNotNull()
        return put_field(df, target, F.when(both, direction))


# minimal embedded public-suffix slice (registered_domain.go uses the
# full PSL via golang.org/x/net/publicsuffix; config `suffixes` extends)
_DEFAULT_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "github.io", "blogspot.com", "herokuapp.com", "s3.amazonaws.com",
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "co", "ai",
    "dev", "app", "info", "biz", "me", "tv", "us", "uk", "de", "fr",
    "jp", "cn", "ru", "br", "in", "au", "ca", "nl", "se", "no", "es", "it",
]


@register
class RegisteredDomain(Processor):
    """registered_domain/registered_domain.go:40,76 — eTLD+1 via suffix
    list. Longest-matching suffix wins; registered domain = one label
    more than the suffix. Native when-chain ordered by label count."""

    name = "registered_domain"

    def apply(self, df: DataFrame) -> DataFrame:
        col = field_col(df, self.cfg.get("field", "dns.question.name"))
        target = self.cfg.get("target_field", "dns.question.registered_domain")
        if col is None:
            return df
        suffixes = sorted(
            set(self.cfg.get("suffixes", _DEFAULT_SUFFIXES)),
            key=lambda s: -s.count("."),
        )
        host = F.lower(col)
        out: Column = F.lit(None).cast("string")
        # iterate ascending specificity so the most specific WHEN lands last
        for suf in reversed(suffixes):
            nlab = suf.count(".") + 1
            is_match = host.endswith("." + suf)
            reg = F.concat(
                F.element_at(F.split(host, r"\."), -nlab - 1), F.lit("." + suf)
            )
            deep_enough = F.size(F.split(host, r"\.")) > nlab
            out = F.when(is_match & deep_enough, reg).otherwise(out)
        return put_field(df, target, out)


@register
class Cache(Processor):
    """cache/cache.go:38-41,128-184 — cross-event KV store keyed by an
    event field. Batch semantics: a "get" row sees the most recent prior
    "put" row with the same key, in `order_by` order — expressed as
    last(ignorenulls) over an ordered window (no driver loop, shuffles
    once on the key).

    cfg: key_field, put_when (condition), value_field, target_field,
    order_by (default '@timestamp').
    """

    name = "cache"

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.window import Window

        key = field_col(df, self.cfg["key_field"])
        val = field_col(df, self.cfg["value_field"])
        order = self.cfg.get("order_by", "@timestamp")
        ocol = field_col(df, order)
        if key is None or val is None or ocol is None:
            return df
        from beats_spark.conditions import compile_condition

        put_cond = compile_condition(df, self.cfg["put_when"])
        stored = F.when(put_cond, val)
        w = (
            Window.partitionBy(key)
            .orderBy(ocol)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return put_field(
            df, self.cfg["target_field"], F.last(stored, ignorenulls=True).over(w)
        )


@register
class Dns(Processor):
    """dns/dns.go:42,80 — reverse/forward lookup against a
    pre-materialized resolution table (no live DNS in executors);
    success/failure tagging via the join hit."""

    name = "dns"

    def apply(self, df: DataFrame) -> DataFrame:
        table = self.cfg.get("table")
        if table is None:
            raise ValueError("dns: pre-resolved `table` DataFrame required")
        out = df
        for src, dst in (self.cfg.get("fields") or {}).items():
            lk = Lookup(
                {
                    "table": table,
                    "key_field": src,
                    "match_field": self.cfg.get("match_field", "query"),
                    "fields": [self.cfg.get("answer_field", "answer")],
                    "target": "",
                }
            )
            tmp = lk.apply(out)
            ans = field_col(tmp, self.cfg.get("answer_field", "answer"))
            out = put_field(tmp, dst, ans)
            if self.cfg.get("answer_field", "answer") != dst:
                out = out.drop(self.cfg.get("answer_field", "answer"))
        return out


@register
class Timeseries(Processor):
    """timeseries/timeseries.go:68 — instance hash over dimension
    fields (fingerprint-style)."""

    name = "timeseries"

    def apply(self, df: DataFrame) -> DataFrame:
        dims = sorted(self.cfg.get("fields", []))
        cols = [c for c in (field_col(df, d) for d in dims) if c is not None]
        if not cols:
            return df
        return put_field(
            df, "timeseries.instance", F.xxhash64(*cols).cast("string")
        )
