-- Canonical overlap-count query (reference queries/q1-coitrees.sql shape),
-- pointed at the bundled test fixture tables.
SET sequila.prefer_interval_join TO true;
SET sequila.interval_join_algorithm TO lapper;
SET datafusion.optimizer.repartition_joins TO false;
SET datafusion.execution.coalesce_batches TO false;

CREATE EXTERNAL TABLE a (contig VARCHAR NOT NULL, pos_start BIGINT NOT NULL, pos_end BIGINT NOT NULL)
STORED AS CSV
LOCATION './testing/data/interval/reads.csv'
OPTIONS ('delimiter' ',', 'has_header' 'true');

CREATE EXTERNAL TABLE b (contig VARCHAR NOT NULL, pos_start BIGINT NOT NULL, pos_end BIGINT NOT NULL)
STORED AS CSV
LOCATION './testing/data/interval/targets.csv'
OPTIONS ('delimiter' ',', 'has_header' 'true');

select count(1) from a join b
 on a.contig = b.contig
and a.pos_end >= b.pos_start
and a.pos_start <= b.pos_end;
