"""Metrics registry + Prometheus exposition.

Reference: metrics/{counter,gauge,histogram}.h null-object defaults,
metrics/register.cc, cloud/metrics/prometheus/family_factory.cc.
"""

import urllib.request

from cartographer_tpu import metrics
from cartographer_tpu.metrics.prometheus import PrometheusExporter, text_exposition


def test_null_metrics_are_free():
    factory = metrics.FamilyFactory(real=False)
    c = factory.counter("c")
    g = factory.gauge("g")
    h = factory.histogram("h")
    c.increment()
    g.set(5.0)
    h.observe(0.5)
    assert c.value() == 0.0
    assert g.value() == 0.0


def test_real_metrics_collect():
    factory = metrics.FamilyFactory(real=True)
    c = factory.counter("searches", "constraint searches")
    g = factory.gauge("queue")
    h = factory.histogram("scores", boundaries=[0.25, 0.5, 0.75, 1.0])
    c.increment()
    c.increment(2.0)
    g.set(7.0)
    g.increment()
    for v in (0.1, 0.3, 0.6, 0.9):
        h.observe(v)
    assert c.value() == 3.0
    assert g.value() == 8.0
    assert sum(h.counts()) == 4


def test_text_exposition_format():
    factory = metrics.FamilyFactory(real=True)
    factory.counter("mapping_constraints_found", "found").increment(3)
    factory.gauge("mapping_queue_size").set(2.0)
    h = factory.histogram("mapping_scores", boundaries=[0.5, 1.0])
    h.observe(0.4)
    h.observe(0.9)
    text = text_exposition(factory)
    assert "# TYPE mapping_constraints_found counter" in text
    assert "mapping_constraints_found 3" in text
    assert "# TYPE mapping_queue_size gauge" in text
    assert "mapping_queue_size 2" in text
    assert 'mapping_scores_bucket{le="0.5"} 1' in text
    assert 'mapping_scores_bucket{le="+Inf"} 2' in text
    assert "mapping_scores_count 2" in text
    assert "# HELP mapping_constraints_found found" in text


def test_prometheus_exporter_scrape():
    factory = metrics.FamilyFactory(real=True)
    factory.counter("scrapes_total").increment(5)
    exporter = PrometheusExporter(0, factory)
    try:
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{exporter.port}/metrics", timeout=10
        ).read().decode()
        assert "scrapes_total 5" in body
    finally:
        exporter.close()
