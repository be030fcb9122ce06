ALTER TABLE lake.db.transcripts RENAME COLUMN tool TO tool_name
