ALTER TABLE lake.db.transcripts ADD COLUMN rating int
