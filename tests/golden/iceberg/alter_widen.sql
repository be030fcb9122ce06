ALTER TABLE lake.db.transcripts ALTER COLUMN turn_idx TYPE bigint
