SET MD5Source='PUBLIC.parity_customer';
-- Main-script fixture (modeled on the reference's merge idiom): one row
-- per SourceCustomerNumber keeping the most recent non-null LastName via
-- collect_max_one, with a dw LEFT OUTER JOIN for the Batch fallback.
-- Exercises converter rules 1/4/5/7/10/11/13/15/16/26/28/31 and the
-- rule-31 empty-table shorthand resolved from the INSERT target.
INSERT OVERWRITE INTO delta_stage_parity_customer (${columns:parity_customer::%1$s})
SELECT ${columns:::m.%1$s}
FROM (
    SELECT
        MAX(s.ID) AS ID
        ,MAX(s.Source) AS Source
        ,s.SourceCustomerNumber AS SourceCustomerNumber
        ,SUBSTRING(MAX(CONCAT(TO_NUMBER_CUSTOM(s.RowModified),IFF(COALESCE(s.LastName,'') = '',NULL,s.LastName))),14) AS LastName
        ,MAX(s.RowModified) AS RowModified
        ,COALESCE(MAX(dw.Batch), MAX(s.Batch)) AS Batch
    FROM delta_udm_parity_customer s
    LEFT OUTER JOIN TABLE($MD5Source) dw
        ON s.ID = dw.ID
    WHERE IFF(position('derived', LOWER(COALESCE(s.Source,''))) > 0, false, true)
    GROUP BY s.SourceCustomerNumber
) m
