-- Hive-side workload script (corrected, runnable form of the reference's
-- resources/scripts/nw_customer/nw_customer_PRE_300.hql): populate the
-- channel-view key for derived customers. Exercises macro expansion with
-- exclusions, UNION ALL branches, LIKE filters over lower(coalesce()),
-- an expression-key inner join (substr + upper), a CASE ordering key and
-- row_number() dedup.
SELECT ${columns:parity_customer::c.%1$s AS %1$s}
FROM (

    SELECT ${columns:parity_customer::s.%1$s AS %1$s}
    FROM udm_s_parity_customer s
    WHERE lower(COALESCE(s.Source,'')) NOT LIKE '%derived%'

    UNION ALL

    SELECT ${columns:parity_customer::u.%1$s AS %1$s}
    FROM (
        SELECT ${columns:parity_customer:~LastName,RowModified:dwc.%1$s AS %1$s}
            ,dwc.LastName AS LastName
            ,1700000000000 AS RowModified
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
                    ,CASE
                        WHEN COALESCE(dw.Source,'') LIKE 'Customer%' THEN 3
                        WHEN COALESCE(dw.Source,'') LIKE '%DMM%' THEN 2
                        ELSE 1
                    END AS forOrdering
                FROM udm_parity_customer dw
                WHERE COALESCE(dw.LastName,'') <> ''
            ) dwc ON sc.SourceCustomerNumber = dwc.joinSCN AND upper(sc.LastName) = upper(dwc.LastName)
    ) u
    WHERE u.rwn = 1

) c
