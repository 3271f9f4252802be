-- Genomic table functions: the bedtools-style verb layer from SQL
-- (engine extension; the reference left closest/complement as empty
-- placeholders — see PARITY.md item 23).
CREATE EXTERNAL TABLE reads (contig VARCHAR NOT NULL, pos_start BIGINT NOT NULL, pos_end BIGINT NOT NULL)
STORED AS CSV
LOCATION './testing/data/interval/reads.csv'
OPTIONS ('delimiter' ',', 'has_header' 'true');

CREATE EXTERNAL TABLE targets (contig VARCHAR NOT NULL, pos_start BIGINT NOT NULL, pos_end BIGINT NOT NULL)
STORED AS CSV
LOCATION './testing/data/interval/targets.csv'
OPTIONS ('delimiter' ',', 'has_header' 'true');

-- merged reads joined back against targets through the interval engine
SELECT m.contig, count(*) AS overlapping_targets
FROM merge('reads') m
JOIN targets b
  ON m.contig = b.contig
 AND m.pos_end >= b.pos_start
 AND m.pos_start <= b.pos_end
GROUP BY m.contig
ORDER BY count(*) DESC, m.contig;

-- per-read target coverage, overlap counts, and set similarity
SELECT contig, pos_start, pos_end, count, bases
FROM coverage('reads', 'targets')
WHERE bases > 0
ORDER BY contig, pos_start
LIMIT 5;

SELECT * FROM jaccard('reads', 'targets');
