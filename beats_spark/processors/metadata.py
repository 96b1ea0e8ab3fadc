"""Metadata-enrichment processor family (SURVEY.md §2.5): every one of
these reference processors is a key→attributes directory lookup with a
cache; the Spark-native form is identical for all of them — a broadcast
left join against a pre-materialized dimension (processors/enrich.py
Lookup). These registrations exist so pipeline configs can use the
reference names with the reference key/target defaults.

Reference locations:
- add_cloud_metadata/add_cloud_metadata.go:43,123
- add_docker_metadata/add_docker_metadata.go:59,150
- add_kubernetes_metadata/kubernetes.go:63,335
- add_process_metadata/add_process_metadata.go:207
- translate_sid/translatesid.go:43,75-110
- translate_ldap_attribute/translate_ldap_attribute.go:48,141

In Beats these consult live APIs (cloud IMDS, docker socket, k8s API,
Windows/LDAP directories) with TTL caches; executors must not do live
I/O, so deployments materialize the directory to a table first — the
cache becomes the broadcast dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from beats_spark.processors.base import Processor, register
from beats_spark.processors.enrich import Lookup


class _LookupAlias(Processor):
    key_default = ""
    target_default = ""

    def apply(self, df: DataFrame) -> DataFrame:
        cfg = dict(self.cfg)
        cfg.setdefault("key_field", self.key_default)
        cfg.setdefault("target", self.target_default)
        return Lookup(cfg).apply(df)


@register
class AddCloudMetadata(_LookupAlias):
    name = "add_cloud_metadata"
    key_default = "host.name"
    target_default = "cloud"


@register
class AddDockerMetadata(_LookupAlias):
    name = "add_docker_metadata"
    key_default = "container.id"
    target_default = "container"


@register
class AddKubernetesMetadata(_LookupAlias):
    name = "add_kubernetes_metadata"
    key_default = "kubernetes.pod.uid"
    target_default = "kubernetes"


@register
class AddProcessMetadata(_LookupAlias):
    name = "add_process_metadata"
    key_default = "process.pid"
    target_default = "process"


@register
class TranslateSid(_LookupAlias):
    name = "translate_sid"
    key_default = "sid"
    target_default = ""


@register
class TranslateLdapAttribute(_LookupAlias):
    name = "translate_ldap_attribute"
    key_default = "user.id"
    target_default = ""
