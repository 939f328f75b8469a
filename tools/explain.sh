#!/bin/bash
# Plan audit: prints formatted physical plans for selected queries.
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} sbt -batch "runMain graft.ExplainAudit $@"
