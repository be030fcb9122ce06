ALTER TABLE lake.db.transcripts DROP COLUMN junk
