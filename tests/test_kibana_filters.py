"""Filter-pill replay + assembly semantics: every distinct filter
pill from the reference dashboards' saved objects compiles through
kibana_filters_to_query, and assembled pills select the right docs.

Corpus: the 33 distinct pills (meta.type phrase / phrases / exists /
custom) deduped from ``source/saved_objects/each-dashboard/*.ndjson``,
embedded verbatim (normalized to query/exists + trimmed meta)."""

import pytest

from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.kql import (
    kibana_filters_to_query, parse_kql,
)
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    search_hits,
)

import json as _json

PILLS = _json.loads(r'''
[
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "Workflow.Status",
   "negate": false,
   "params": [
    "NEW",
    "NOTIFIED"
   ],
   "type": "phrases"
  },
  "query": {
   "bool": {
    "minimum_should_match": 1,
    "should": [
     {
      "match_phrase": {
       "Workflow.Status": "NEW"
      }
     },
     {
      "match_phrase": {
       "Workflow.Status": "NOTIFIED"
      }
     }
    ]
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "action",
   "negate": false,
   "params": {
    "query": "ACCEPT"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "action": "ACCEPT"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "action",
   "negate": false,
   "params": {
    "query": "REJECT"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "action": "REJECT"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "activity_name",
   "negate": false,
   "params": {
    "query": "Refuse"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "activity_name": "Refuse"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "activity_name",
   "negate": false,
   "params": {
    "query": "Traffic"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "activity_name": "Traffic"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "class_uid",
   "negate": false,
   "params": {
    "query": "4001"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "class_uid": "4001"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "clientvpn.connection-log-type",
   "negate": false,
   "params": {
    "query": "connection-attempt"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "clientvpn.connection-log-type": "connection-attempt"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "clientvpn.connection-log-type",
   "negate": false,
   "params": {
    "query": "connection-reset"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "clientvpn.connection-log-type": "connection-reset"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "event.module",
   "negate": false,
   "params": {
    "query": "security hub"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "event.module": "security hub"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "event.module",
   "negate": true,
   "params": {
    "query": "security hub"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "event.module": "security hub"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "event.outcome",
   "negate": false,
   "params": {
    "query": "failure"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "event.outcome": "failure"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "event.outcome",
   "negate": false,
   "params": {
    "query": "success"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "event.outcome": "success"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "event.outcome",
   "negate": true,
   "params": {
    "query": "failure"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "event.outcome": "failure"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "eventSource",
   "negate": false,
   "params": {
    "query": "s3.amazonaws.com"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "eventSource": "s3.amazonaws.com"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "metricset.name",
   "negate": false,
   "params": {
    "query": "index"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "metricset.name": "index"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "metricset.name",
   "negate": false,
   "params": {
    "query": "shard"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "metricset.name": "shard"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "opensearch.index.index_status",
   "negate": false,
   "params": {
    "query": "open"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "opensearch.index.index_status": "open"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "opensearch.index.storage_tier",
   "negate": false,
   "params": {
    "query": "hot"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "opensearch.index.storage_tier": "hot"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "opensearch.shard.primary",
   "negate": false,
   "params": {
    "query": true
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "opensearch.shard.primary": true
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "query",
   "negate": false,
   "params": null,
   "type": "custom"
  },
  "query": {
   "bool": {
    "should": [
     {
      "wildcard": {
       "opensearch.index.name": "metrics*"
      }
     },
     {
      "wildcard": {
       "opensearch.index.name": "log*"
      }
     }
    ]
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "query",
   "negate": false,
   "params": null,
   "type": "custom"
  },
  "query": {
   "range": {
    "@timestamp": {
     "gte": "now-2h"
    }
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "query",
   "negate": true,
   "params": null,
   "type": "custom"
  },
  "query": {
   "bool": {
    "minimum_should_match": 1,
    "should": [
     {
      "match_phrase": {
       "service.additionalInfo.sample": true
      }
     },
     {
      "match_phrase": {
       "service.additionalInfo.value": "{\"sample\":true}"
      }
     }
    ]
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "tcp_flags",
   "negate": false,
   "params": {
    "query": "2"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "tcp_flags": "2"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "traffic_path",
   "negate": false,
   "params": {
    "query": "1"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "traffic_path": "1"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "traffic_path",
   "negate": false,
   "params": {
    "query": "2"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "traffic_path": "2"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "traffic_path",
   "negate": false,
   "params": {
    "query": "3"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "traffic_path": "3"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "traffic_path",
   "negate": false,
   "params": {
    "query": "4"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "traffic_path": "4"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "traffic_path",
   "negate": false,
   "params": {
    "query": "5"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "traffic_path": "5"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "traffic_path",
   "negate": false,
   "params": {
    "query": "6"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "traffic_path": "6"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "traffic_path",
   "negate": false,
   "params": {
    "query": "7"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "traffic_path": "7"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "traffic_path",
   "negate": false,
   "params": {
    "query": "8"
   },
   "type": "phrase"
  },
  "query": {
   "match_phrase": {
    "traffic_path": "8"
   }
  }
 },
 {
  "exists": null,
  "meta": {
   "disabled": false,
   "key": "user_agent.original",
   "negate": true,
   "params": [
    "ELB-HealthChecker/1.0",
    "ELB-HealthChecker/2.0"
   ],
   "type": "phrases"
  },
  "query": {
   "bool": {
    "minimum_should_match": 1,
    "should": [
     {
      "match_phrase": {
       "user_agent.original": "ELB-HealthChecker/1.0"
      }
     },
     {
      "match_phrase": {
       "user_agent.original": "ELB-HealthChecker/2.0"
      }
     }
    ]
   }
  }
 },
 {
  "exists": {
   "field": "opensearch.shard.store.size_in_bytes"
  },
  "meta": {
   "disabled": false,
   "key": "opensearch.shard.store.size_in_bytes",
   "negate": false,
   "params": null,
   "type": "exists"
  },
  "query": null
 }
]
''')


def test_every_reference_pill_compiles():
    node = kibana_filters_to_query(PILLS)
    assert "bool" in node
    # negated pills land in must_not, the rest in filter
    n_active = sum(1 for p in PILLS if not p["meta"].get("disabled"))
    b = node["bool"]
    assert len(b.get("filter", [])) + len(b.get("must_not", [])) \
        == n_active


@pytest.fixture(scope="module")
def ix(spark):
    rows = [(0, "alpha beta", "failure", "NEW", 5),
            (1, "alpha gamma", "success", "NOTIFIED", None),
            (2, "delta beta", "failure", "RESOLVED", 9),
            (3, "delta omega", "success", "NEW", 2)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, outcome string, status string, "
        "size long")
    return build_index(spark, docs, text_col="text", id_col="doc_id",
                       keep_cols=["outcome", "status", "size"])


def _ids(ix, filters, query=None):
    node = kibana_filters_to_query(filters, query=query)
    return sorted(r["doc_id"] for r in
                  search_hits(ix, {"query": node, "size": 10}).collect())


def test_pill_assembly_semantics(ix):
    phrase = {"meta": {"type": "phrase", "key": "outcome", "negate": False,
                       "params": {"query": "failure"}}}
    assert _ids(ix, [phrase]) == [0, 2]
    negated = {"meta": {"type": "phrase", "key": "outcome", "negate": True,
                        "params": {"query": "failure"}}}
    assert _ids(ix, [negated]) == [1, 3]
    phrases = {"meta": {"type": "phrases", "key": "status",
                        "negate": False, "params": ["NEW", "NOTIFIED"]}}
    assert _ids(ix, [phrases]) == [0, 1, 3]
    exists = {"meta": {"type": "exists", "key": "size", "negate": False},
              "exists": {"field": "size"}}
    assert _ids(ix, [exists]) == [0, 2, 3]
    rng = {"meta": {"type": "range", "key": "size", "negate": False,
                    "params": {"gte": 5}}}
    assert _ids(ix, [rng]) == [0, 2]
    disabled = {"meta": {"type": "phrase", "key": "outcome",
                         "negate": False, "disabled": True,
                         "params": {"query": "failure"}}}
    assert _ids(ix, [disabled]) == [0, 1, 2, 3]
    # the dashboards' actual request: search-bar KQL + pills together
    assert _ids(ix, [phrase, phrases],
                query=parse_kql("alpha or delta")) == [0]
    # custom pill carrying its own bool query, match_phrase rewritten
    # to keyword equality on non-text fields
    custom = {"meta": {"type": "custom", "negate": True},
              "query": {"bool": {"should": [
                  {"match_phrase": {"status": "RESOLVED"}}],
                  "minimum_should_match": 1}}}
    assert _ids(ix, [custom]) == [0, 1, 3]
