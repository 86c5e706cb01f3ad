-- Main-script fixture (modeled on the reference's merge idiom): one row
-- per SourceCustomerNumber keeping the most recent non-null LastName via
-- collect_max_one, with a dw LEFT OUTER JOIN for the Batch fallback.
-- Exercises converter rules 1/4/5/7/10/11/13/15/16/26/28/31 and the
-- rule-31 empty-table shorthand resolved from the INSERT target.
INSERT INTO TABLE udm_parity_customer
SELECT ${columns:::m.%1$s}
FROM (
    SELECT
        MAX(s.ID) AS ID
        ,MAX(s.Source) AS Source
        ,s.SourceCustomerNumber AS SourceCustomerNumber
        ,CASE WHEN map_values (collect_max_one (COALESCE(s.LastName,''),CASE WHEN s.LastName IS NULL then 0L else s.RowModified END))[0]= 0L THEN NULL
            ELSE map_keys (collect_max_one (COALESCE(s.LastName,''),CASE WHEN s.LastName IS NULL then 0L else s.RowModified END))[0] END AS LastName
        ,MAX(s.RowModified) AS RowModified
        ,COALESCE(MAX(dw.Batch), MAX(s.Batch)) AS Batch
    FROM udm_s_parity_customer s
    LEFT OUTER JOIN udm_parity_customer dw
        ON s.ID = dw.ID
    WHERE IF(locate('derived', LCASE(COALESCE(s.Source,''))) > 0, false, true)
    GROUP BY s.SourceCustomerNumber
) m
