-- Snowflake-side counterpart (corrected, runnable form of the reference's
-- resources/scripts/sf_dw_customer/sf_dw_customer_PRE_300.sql). It
-- INTENTIONALLY diverges from the Hive variant on two columns, exactly
-- like the reference pair: LastName gets an 'ee' suffix on the derived
-- branch and RowModified uses a different timestamp literal. Also uses
-- Snowflake-isms (IFF) the dialect rewriter must neutralize.
SELECT ${columns:parity_customer::c.%1$s AS %1$s}
FROM (

    SELECT ${columns:parity_customer::s.%1$s AS %1$s}
    FROM udm_s_parity_customer s
    WHERE lower(COALESCE(s.Source,'')) NOT LIKE '%derived%'

    UNION ALL

    SELECT ${columns:parity_customer::u.%1$s AS %1$s}
    FROM (
        SELECT ${columns:parity_customer:~LastName,RowModified:dwc.%1$s AS %1$s}
            ,concat(dwc.LastName, 'ee') AS LastName
            ,1700000001000 AS RowModified
            ,row_number() OVER (partition by dwc.SourceCustomerNumber
                                order by dwc.forOrdering desc, dwc.RowModified desc, dwc.ID desc) AS rwn
        FROM (
                SELECT
                    SourceCustomerNumber
                    ,LastName
                FROM udm_s_parity_customer
                WHERE lower(COALESCE(Source,'')) LIKE '%derived%'
            ) sc
            INNER JOIN (
                SELECT ${columns:parity_customer::dw.%1$s AS %1$s}
                    ,substr(dw.SourceCustomerNumber,1,20) AS joinSCN
                    ,IFF(COALESCE(dw.Source,'') LIKE 'Customer%', 3,
                         IFF(COALESCE(dw.Source,'') LIKE '%DMM%', 2, 1)) AS forOrdering
                FROM udm_parity_customer dw
                WHERE COALESCE(dw.LastName,'') <> ''
            ) dwc ON sc.SourceCustomerNumber = dwc.joinSCN AND upper(sc.LastName) = upper(dwc.LastName)
    ) u
    WHERE u.rwn = 1

) c
