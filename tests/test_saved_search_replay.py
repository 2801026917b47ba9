"""Saved-search replay: every distinct query string from the
reference's dashboards parses and compiles.

Corpus: the 107 distinct query strings extracted from the reference
repo's ``source/saved_objects/each-dashboard/*.ndjson`` saved objects
(cloudtrail / guardduty / securityhub / vpcflow / elb / rds /
cloudhsm / clientvpn / ocsf-* dashboards), embedded here verbatim so
the repo stays standalone. 81 are ``language: kuery`` (the dashboards'
default) -> ``index/kql.py``; 26 are ``language: lucene`` ->
``index/querystring.py``. The gate: a user pasting ANY reference
saved search gets a compiled query, not a syntax error."""

import datetime

import pytest

from siem_on_amazon_opensearch_service_spark.index.kql import parse_kql
from siem_on_amazon_opensearch_service_spark.index.querystring import (
    parse_query_string,
)

KUERY = [
    '"action": "ACCEPT"',
    '"action": "REJECT"',
    '( postgresql.message: process and *lock ) OR ( mysql.lock_time > 0 )',
    '(@timestamp > "now-7d") and metricset.name:shard and opensearch.shard.primary:true',
    '(log.level: LOG and (rds.query:* or postgresql_query_step:*)) or event.module: slowquery',
    'NOT request_processing_time<0 AND NOT response_processing_time<0',
    'ProductFields.aws/securityhub/ProductName: "GuardDuty"',
    'ProductFields.aws/securityhub/ProductName: "IAM Access Analyzer"',
    'ProductFields.aws/securityhub/ProductName: "Security Hub"',
    'ProductFields.aws/securityhub/ProductName: "Systems Manager Patch Manager"',
    'ProductFields.aws/securityhub/ProductName: Inspector',
    'ProductFields.aws/securityhub/ProductName: Macie',
    'ResourceTypeAffected:EC2 AND NOT ThreatFamilyName:(MaliciousFile OR SuspiciousFile)',
    'ResourceTypeAffected:IAMUser',
    'ResourceTypeAffected:Kubernetes AND NOT ThreatFamilyName:(MaliciousFile OR SuspiciousFile)',
    'ResourceTypeAffected:S3',
    'Severity.Label:CRITICAL',
    'Severity.Label:HIGH',
    'Severity.Label:INFORMATIONAL',
    'Severity.Label:LOW',
    'Severity.Label:MEDIUM',
    'ThreatFamilyName:(MaliciousFile OR SuspiciousFile)',
    'action:ACCEPT',
    'action:BLOCK',
    'action:REJECT',
    'activity_name:"Refuse"',
    'activity_name:"Traffic"',
    'cloudhsm.opcode: (CN_CREATE_USER OR CN_CREATE_CO) AND event.outcome:success',
    'cloudhsm.opcode: CN_LOGIN',
    'cloudhsm.opcode:(CN_TOMBSTONE_OBJECT OR CN_DESTROY_OBJECT) AND event.outcome:success',
    'cloudhsm.opcode:CN_GENERATE_KEY AND event.outcome:success',
    'cloudhsm.opcode:CN_GENERATE_KEY_PAIR AND event.outcome:success',
    'cloudhsm.opcode:CN_SHARE_OBJECT AND event.outcome:success',
    'cloudhsm.opcode_hex: 0xd AND NOT cloudhsm.hsm_return: SUCCESS',
    'cloudhsm.opcode_hex: 0xd AND cloudhsm.hsm_return: SUCCESS',
    'errorCode:*UnauthorizedOperation OR errorCode:AccessDenied*',
    'event.category: authentication',
    'eventName:(AuthorizeSecurityGroupIngress OR AuthorizeSecurityGroupEgress OR RevokeSecurityGroupIngress OR RevokeSecurityGroupEgress OR CreateSecurityGroup OR DeleteSecurityGroup)',
    'eventName:(CreateCustomerGateway OR DeleteCustomerGateway OR AttachInternetGateway OR CreateInternetGateway OR DeleteInternetGateway OR DetachInternetGateway)',
    'eventName:(CreateNetworkAcl OR CreateNetworkAclEntry OR DeleteNetworkAcl OR DeleteNetworkAclEntry OR ReplaceNetworkAclEntry OR ReplaceNetworkAclAssociation)',
    'eventName:(CreateRoute OR CreateRouteTable OR ReplaceRoute OR ReplaceRouteTableAssociation OR DeleteRouteTable OR DeleteRoute OR DisassociateRouteTable)',
    'eventName:(CreateVpc OR DeleteVpc OR ModifyVpcAttribute OR AcceptVpcPeeringConnection OR CreateVpcPeeringConnection OR DeleteVpcPeeringConnection OR RejectVpcPeeringConnection OR AttachClassicLinkVpc OR DetachClassicLinkVpc OR DisableVpcClassicLink OR EnableVpcClassicLink)',
    'eventSource:kms.amazonaws.com AND eventName:(DisableKey OR ScheduleKeyDeletion OR PutKeyPolicy)',
    'eventSource:s3.amazonaws.com AND (eventName:(PutBucketAcl OR PutBucketPolicy OR PutBucketCors OR PutBucketLifecycle OR PutBucketReplication OR DeleteBucketPolicy OR DeleteBucketCors OR DeleteBucketLifecycle OR DeleteBucketReplication))',
    'log.level: ERROR',
    'log.level: Error',
    'log.level: FATAL',
    'log.level: System',
    'log.level: WARNING',
    'log.level: Warning',
    'log.level:PANIC',
    'log.level:STATEMENT or event.module:audit',
    'log.level:\xa0ERROR',
    'log.level:\xa0FATAL',
    'log.level:\xa0WARNING',
    'metricset.name:shard',
    'not ProductFields.aws/securityhub/ProductName: ("Security Hub" or GuardDuty or Inspector or Macie or "IAM Access Analyzer" or "Systems Manager Patch Manager")',
    'opensearch.index.storage_tier: cold',
    'opensearch.index.storage_tier: hot',
    'opensearch.index.storage_tier: warm',
    'rds.query: create',
    'rds.query: drop',
    'rds.query: grant',
    'rds.query:DELETE and ( log.level:LOG or event.module: slowquery )',
    'rds.query:INSERT and ( log.level:LOG or event.module: slowquery )',
    'rds.query:SELECT and ( log.level:LOG or event.module: slowquery )',
    'rds.query:UPDATE and ( log.level:LOG or event.module: slowquery )',
    'rds.query:\xa0alter',
    'responseElements.ConsoleLogin:Failure',
    'severitylabel:high',
    'severitylabel:low',
    'severitylabel:medium',
    'traffic_path: 1',
    'traffic_path: 2',
    'traffic_path: 3',
    'traffic_path: 4',
    'traffic_path: 5',
    'traffic_path: 6',
    'traffic_path: 7',
    'traffic_path: 8',
    'userIdentity.type:Root AND NOT userIdentity.invokedBy:* AND NOT eventType:AwsServiceEvent',
]

LUCENE = [
    '1',
    '2',
    '3',
    '4',
    '4001',
    '5',
    '6',
    '7',
    '8',
    'ACCEPT',
    'HTTPstatus:503',
    'HTTPstatus:{400 TO 499}',
    'HTTPstatus:{500 TO 599}',
    'REJECT',
    'Refuse',
    'Traffic',
    'connection-attempt',
    'connection-reset',
    'failure',
    'hot',
    'index',
    'open',
    's3.amazonaws.com',
    'security hub',
    'shard',
    'success',
]

NOW = datetime.datetime(2024, 6, 1)


@pytest.mark.parametrize("q", KUERY)
def test_every_kuery_saved_search_compiles(q):
    node = parse_kql(q, now=NOW)
    assert isinstance(node, dict) and len(node) == 1


@pytest.mark.parametrize("q", LUCENE)
def test_every_lucene_saved_search_parses(q):
    tree = parse_query_string(q)
    assert tree is not None
